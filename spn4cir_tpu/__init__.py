"""spn4cir_tpu — TPU-native composed-image-retrieval framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
BUAADreamer/SPN4CIR (see SURVEY.md): two-stage contrastive CIR training with
scaled positives (generated triplets) and scaled negatives (device-resident
feature memory banks), four supervised backbones (clip4cir, tgcir, blip4cir,
blip24cir) plus zero-shot (zscir), FashionIQ/CIRR evaluation and CIRR
test-server submission, and an offline positive-generation pipeline.

Unlike the reference's five copy-pasted PyTorch trees, L2-L5 (data, banks,
training, eval) are implemented once here and parameterized by a small
backbone protocol (`spn4cir_tpu.models.api.CIRBackbone`).
"""

__version__ = "0.1.0"
