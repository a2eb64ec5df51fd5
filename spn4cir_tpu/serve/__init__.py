from spn4cir_tpu.serve.service import RetrievalService, serve

__all__ = ["RetrievalService", "serve"]
