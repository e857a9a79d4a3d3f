"""TPU-native framework for probing temporal dynamics of human behavioral alignment.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of the
seemadhungana/ViT-Project reference pipeline:

- CLIP ViT-L/14 + DoRA behavioral fine-tuning on THINGS/SPoSE 66-D embeddings with
  per-epoch behavioral RSA (RDM + Spearman rho vs a human triplet RDM), early stopping,
  and bit-exact fork/resume from per-epoch checkpoints.
- ViT-B/16 supervised ImageNet training (SGD + warmup-cosine), data-parallel over a
  TPU device mesh.
- Four deterministic perturbation injectors (random targets, label shuffle, Gaussian
  noise images, uniform/blank images) applied in controlled epoch windows, plus the
  single-epoch sweep, variable-length grid, and single-epoch measurement drivers.

Layers (bottom-up): core -> ops (Pallas/XLA kernels) -> models -> adapters -> data ->
perturb -> train -> parallel -> ckpt -> cli -> analysis.
"""

__version__ = "0.1.0"
