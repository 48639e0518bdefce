"""Typed configuration layer.

The reference scatters configuration across three mechanisms: an easydict
yaml-merged global (`AttnGAN++/miscc/config.py:7-68`), per-metric argparse
CLIs (`image_realism/FID/fid_score.py:51-64` etc.) and tf.app.flags
(`image_realism/IS/bird/inception_score_star_bird.py:33-49`), plus magic
constants baked into the scripts (calibration temperatures, thresholds).

Here everything is a frozen dataclass with explicit defaults; the magic
constants of the reference are named and documented so a run can reproduce the
published numbers exactly, and every metric CLI builds its flags from the
dataclass fields (flag names stay compatible with the reference scripts).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

# ---------------------------------------------------------------------------
# Reference calibration constants (BASELINE.md "Fixed calibration constants").
# These must be preserved exactly for metric parity.
# ---------------------------------------------------------------------------

#: IS* temperature, CUB 50-class fine-tuned backbone
#: (reference: image_realism/IS/bird/inception_score_star_bird.py:192)
IS_STAR_TEMPERATURE_CUB = 0.5980541706085205

#: IS* temperature, COCO ImageNet-2015 frozen-graph backbone
#: (reference: image_realism/IS/coco/inception_score_star_coco.py:107)
IS_STAR_TEMPERATURE_COCO = 0.9091363549232483

#: O-IS temperature, 80-class COCO fine-tuned backbone
#: (reference: object_fidelity/O-IS/object_centric_inception_score.py:55)
O_IS_TEMPERATURE = 2.1737587451934814

#: Detector score threshold used for object cropping and SOA
#: (reference: object_fidelity/crop_object.py:20, semantic_object_accuracy/SOA.py:21)
DETECTOR_SCORE_THRESHOLD = 0.5

#: PA success threshold: P(gt caption) must exceed this
#: (reference: positional_alignment/PA.py:41)
PA_SUCCESS_THRESHOLD = 0.6

#: Number of splits/bins for IS*/O-IS/RP
#: (reference: inception_score_star_bird.py:44, object_centric_inception_score.py:123,
#:  RP_coco.py:44, RP_cub.py:153-156)
NUM_SPLITS = 10


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded extraction / training.

    The reference's only parallelism is single-host multi-GPU DataParallel
    (AttnGAN++/trainer.py:126-131) and SyncBatchNorm thread collectives
    (sync_batchnorm/comm.py:57-137).  The TPU-native equivalent is a 2D
    ``(data, model)`` mesh: batches shard over ``data`` (ICI collectives take
    the place of scatter/gather and of SyncBN's reduction), and the wide
    embedding / fc weights may shard over ``model``.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    #: -1 means "use all available devices on the data axis".
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass(frozen=True)
class DataConfig:
    """Image-folder dataset configuration.

    Mirrors the reference folder conventions: recursive walk collecting
    ``*.jpg``/``*.png`` (image_realism/FID/img_data.py:27-35,
    inception_score_star_coco.py:124-135).
    """

    batch_size: int = 64
    image_size: int = 299
    #: Drop the final partial batch (reference FID uses a DataLoader with
    #: drop_last=True — fid_score.py:216).  ``legacy_compat`` metric configs
    #: reproduce this; the default keeps every image via padding+masking.
    drop_last: bool = False
    num_workers: int = 8
    #: Host-side prefetch depth (batches decoded ahead of the device).
    prefetch: int = 2


@dataclass(frozen=True)
class MetricConfig:
    """Shared metric-run options."""

    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    #: Reproduce the reference's quirks bit-for-bit (drop_last tail batches,
    #: unseeded shuffles replaced by a fixed seed, the RP_cub off-by-one bin
    #: slice).  When False, the deterministic fixed versions are used.
    legacy_compat: bool = False
    #: Seed for the shuffles the reference leaves unseeded
    #: (RP_coco.py:43, inception_score_star_bird.py:85, RP_cub.py:154).
    seed: int = 0
    #: Computation dtype for backbone forwards ("float32" or "bfloat16").
    dtype: str = "float32"


def configure_precision(mode: str = "highest") -> None:
    """Set the global matmul/conv precision for metric runs.

    TPU's default f32 matmul path uses bf16 passes (~2e-3 relative error vs
    the reference's CPU/CUDA fp32 — measured on the DAMSM encoder); metric
    CLIs default to "highest" so values match the reference to float
    tolerance (BASELINE.json).  Pass "fast" (--precision fast) to trade
    parity for extraction throughput.
    """
    import jax

    # "default" = the TPU bf16-pass f32 matmul (this jax rejects "fastest")
    jax.config.update("jax_default_matmul_precision", {"fast": "default", "highest": "highest"}[mode])


def add_distributed_flags(parser) -> None:
    """Multi-host flags (SURVEY.md section 2.3 DCN headroom): when
    --coordinator is given, every participating process runs the same CLI;
    work items shard across processes (each on its local-device mesh) and
    per-item outputs allgather back into global order before the metric math
    — see tise_tpu/parallel/multihost.py.  Verified with a real 2-process
    cluster in tests/test_multihost.py."""
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port for multi-host runs (jax.distributed)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)


def maybe_init_distributed(args) -> None:
    """Initialise jax.distributed iff --coordinator was passed (must run
    before first backend use)."""
    if getattr(args, "coordinator", None):
        from tise_tpu.parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)


def add_precision_flag(parser) -> None:
    parser.add_argument(
        "--precision",
        choices=["highest", "fast"],
        default="highest",
        help="matmul precision: 'highest' = reference float parity (default), 'fast' = max throughput",
    )


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(asdict(cfg), indent=2, sort_keys=True)


def replace(cfg: Any, **kw: Any) -> Any:
    return dataclasses.replace(cfg, **kw)


def add_dataclass_flags(parser, cls, prefix: str = "") -> None:
    """Register dataclass fields as argparse flags (``--a.b`` style)."""
    for f in dataclasses.fields(cls):
        name = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.default_factory, type) and dataclasses.is_dataclass(f.default_factory)
        ):
            add_dataclass_flags(parser, f.default_factory, prefix=f"{name}.")
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        typ = {int: int, float: float, str: str}.get(type(default), str)
        if isinstance(default, bool):
            parser.add_argument(f"--{name}", type=lambda s: s.lower() in ("1", "true", "yes"), default=default)
        else:
            parser.add_argument(f"--{name}", type=typ, default=default)


def dataclass_from_flags(cls, args, prefix: str = ""):
    """Build a dataclass instance from parsed argparse flags."""
    kw = {}
    for f in dataclasses.fields(cls):
        name = f"{prefix}{f.name}"
        factory = f.default_factory if f.default_factory is not dataclasses.MISSING else None
        if isinstance(factory, type) and dataclasses.is_dataclass(factory):
            kw[f.name] = dataclass_from_flags(factory, args, prefix=f"{name}.")
        else:
            key = name.replace(".", "_") if not hasattr(args, name) else name
            if hasattr(args, name):
                kw[f.name] = getattr(args, name)
            elif hasattr(args, key):
                kw[f.name] = getattr(args, key)
    return cls(**kw)
