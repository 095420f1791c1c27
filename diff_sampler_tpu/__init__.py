"""diff_sampler_tpu: a TPU-native JAX framework for fast (few-NFE) sampling of
diffusion models, with the capabilities of zju-pi/diff-sampler.

Subpackages:
  ops       - schedules, multistep solver coefficients, Pallas kernels
  solvers   - scan-based ODE samplers (euler/heun/dpm/ipndm/ipndm_v/deis/dpmpp/unipc)
              plus AMED trainable-midpoint samplers
  models    - Flax U-Nets (SongUNet/DhariwalUNet/...), preconditioner wrappers,
              analytic denoisers, torch-checkpoint loaders
  parallel  - mesh construction, data-parallel sampling/training helpers
  training  - AMED predictor and SFD distillation trainers
  gits      - DP-based time-schedule search
  eval      - FID / CLIP score / PRDC
  utils     - per-seed RNG, config, logging, image IO
"""

__version__ = "0.1.0"
