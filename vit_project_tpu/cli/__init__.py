# Entry points (python -m vit_project_tpu.cli.<name>):
#   baseline    - CLIP-HBA behavioral baseline training
#   sweep       - single-epoch perturbation sweep driver
#   lengths     - variable-length perturbation CLI (SLURM-style args)
#   vit_train   - ViT-B/16 ImageNet supervised training
#   vit_measure - ViT single-epoch perturbation measurement grid
