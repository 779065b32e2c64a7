"""Model zoo: architectures built directly in the engine IR.

The reference ships 23 example binaries driving ONNX exports
(rten-examples/); here the flagship families are constructed in IR from
config + weights (no ONNX round-trip needed), while arbitrary ONNX models
still load through rten_tpu.Model. Families mirror the BASELINE configs:
MNIST MLP/CNN, ResNet-50, DistilBERT, GPT-2, Whisper.
"""

from . import gpt2  # noqa: F401
