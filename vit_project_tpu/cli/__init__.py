# Entry points (python -m vit_project_tpu.cli.<name>):
#   baseline     - CLIP-HBA behavioral baseline training
#   sweep        - single-epoch perturbation sweep driver
#   lengths      - variable-length perturbation CLI (SLURM-style args)
#   vit_train    - ViT-B/16 ImageNet supervised training
#   vit_measure  - ViT single-epoch perturbation measurement grid
#   vit_rsa_eval - per-checkpoint ViT RSA evaluation (rsa_results CSV)
#   serve        - batch serving + online HTTP daemon (--http_port)
#   pack         - ImageFolder -> fipack packed-shard converter
#   profile      - per-bucket device-time profile of the train step
