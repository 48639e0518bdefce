"""tise-tpu: a TPU-native (JAX/Flax/Pallas) text-to-image evaluation framework.

Re-implementation of the full capability surface of the TISE toolbox
(VinAIResearch/tise-toolbox) designed TPU-first: all backbone forwards are
sharded pjit computations over a `jax.sharding.Mesh`, preprocessing and the
statistic accumulators are fused device kernels, and the metric layer is a set
of thin host orchestrators with CLI-compatible entry points.

Layout (mirrors SURVEY.md section 7):
  core/        typed config, result IO, image dataset, mesh/sharding helpers
  ops/         math kernels: resize parity, streaming moments, sqrtm, split-KL
  backbones/   InceptionV3 (torchvision + TF-slim arch), CLIP ViT-B/32, DAMSM,
               detection (Mask R-CNN R50-FPN, static shapes), PRM counter
  metrics/     fid, is_star, o_is, o_fid, rp_coco, rp_cub, soa, pa, ca
  ranking/     aggregate ranking score (reference parity)
  calibration/ temperature scaling + ECE
  models/      AttnGAN++ and CounterModel text-to-image GANs (Flax, pjit DP)
"""

__version__ = "0.1.0"
