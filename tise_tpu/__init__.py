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

import os as _os

# Bound the axon TPU-tunnel client's transfer journal.  The client journals
# every host->device transfer so it can transparently replay the session
# after a tunnel drop; on streaming pipelines this retains every uploaded
# batch => unbounded host RSS (measured: exactly input-size bytes leaked per
# device_put, ~11 MB/800px image; two 30k SOA sweeps were OOM-killed at
# ~128 GB host RSS; gc and Array.delete() do not help — tools/leak_probe.py).
# AXON_JOURNAL_COMPACT=1 bounds it at 0.0 MB/iter with unchanged dispatch
# rate (33 vs 31 ms/dispatch).  Trade-off: after a tunnel drop the client
# must reset-and-retry instead of replaying, so resident device state is no
# longer drop-proof — acceptable because trainers checkpoint via orbax and
# metric pipelines re-upload weights, whereas the unbounded journal is
# certain death for any long run.  setdefault => users can pre-set =0 to
# restore replay.  Must run before the first jax backend init; importing
# tise_tpu before querying jax devices (all CLIs do) guarantees that.
_os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

__version__ = "0.1.0"
