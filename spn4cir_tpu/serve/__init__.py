from spn4cir_tpu.serve.service import (
    BatchingRetrievalService,
    RetrievalService,
    serve,
)

__all__ = ["BatchingRetrievalService", "RetrievalService", "serve"]
