"""moditalker_tpu — a TPU-native (JAX/XLA/Pallas/pjit) talking-head generation framework.

Re-implements the full capability surface of MoDiTalker (arXiv:2403.19144,
reference: cvlab-kaist/MoDiTalker) as one coherent framework:

  * ``models.atom``  — AToM: audio-to-motion FiLM transformer diffusion
    (reference ``AToM/model/model.py``, ``AToM/model/diffusion.py``)
  * ``models.mtov``  — MToV: triplane latent video diffusion — TimeSformer ViT
    autoencoders + triplane UNet + DDPM core
    (reference ``MToV/models/**``, ``MToV/losses/ddpm.py``)
  * ``preprocess``   — HuBERT audio features, BFM landmark math, pose
    alignment (reference ``data/data_utils/**``)
  * ``core``         — shared substrate: diffusion schedules, EMA, sharding,
    checkpointing, config, RNG discipline
  * ``ops``          — attention / rotary embeddings / Pallas TPU kernels

Unlike the reference (three sibling apps with copy-pasted utilities), this is
a single framework with one shared core. All compute paths are functional JAX
traced under ``jit`` and shard across a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
