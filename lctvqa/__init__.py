"""lctvqa — a TPU-native VQA / LCT / PC-DARTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of aahamed/LCT-VQA
(reference layer map in /root/repo/SURVEY.md): the basic VQA model (VGG19 +
LSTM + mul-fusion classifier), the question-generating "test-creator" (EF)
model, PC-DARTS architecture search over the image encoder, and the LCT
tri-level optimization — expressed as pure functions, jit-compiled train
steps, grad-through-unroll architects, and data-parallel execution over a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
