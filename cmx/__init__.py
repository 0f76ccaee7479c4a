"""cmx — TPU-native CM-UNet framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
CamilleChallier/Contrastive-Masked-UNet (reference mounted at /root/reference):
one 5-level UNet model family, five self-supervised pretraining regimes
(Model Genesis, MAE, MoCo v2, SparK, CM-UNet) sharing the encoder, and a
supervised fine-tuning/evaluation harness, all built on a single pjit
data-parallel trainer with functional EMA/queue state.

Layout:
  cmx.models    — UNet encoder/decoder/necks (flax.linen, NHWC, bf16 compute)
  cmx.ops       — device ops: masking, augmentation, morphology, Pallas kernels
  cmx.ssl       — the five pretraining objectives as pure loss graphs
  cmx.train     — pjit trainer, schedules, optimizers, train state
  cmx.eval      — device metrics (Dice/IoU/clDice) + host metrics (Hausdorff)
  cmx.data      — npy corpus IO, seed-42 split contract, host pipeline
  cmx.parallel  — mesh/sharding helpers (data-parallel over ICI)
  cmx.ckpt      — orbax checkpointing, encoder-only export
  cmx.config    — single dataclass config system with dotted CLI overrides
  cmx.cli       — pretrain / finetune / eval entry points
  cmx.native    — C++ data-loading runtime (ctypes bindings)
"""

__version__ = "0.1.0"
