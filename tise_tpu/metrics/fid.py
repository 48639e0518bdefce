"""FID — Fréchet Inception Distance (reference: image_realism/FID/fid_score.py).

Pipeline parity:
  folder -> PIL resize 299 bilinear (transforms.Resize, fid_score.py:208-213)
         -> [0,1] -> TTUR renormalization (inception.py:120-124, fused)
         -> InceptionV3 pool3 (2048)  [sharded pjit forward]
         -> mean / covariance         (np.mean / np.cov, fid_score.py:194-195)
  FID = ||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))   (fid_score.py:121-171)

Either path may be a cached ``.npz`` with ``mu``/``sigma`` (fid_score.py:200-203).
``legacy_compat`` reproduces the reference's drop_last tail-batch discard
(fid_score.py:216); the default keeps every image (padded + masked batches).
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import jax
import numpy as np

from tise_tpu.backbones import inception_v3
from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed)
from tise_tpu.core.data import ImageFolderLoader
from tise_tpu.metrics.extractor import BatchedExtractor
from tise_tpu.ops import sqrtm, stats


def make_pool3_extractor(
    params, mesh=None, dtype=None, device_resize_from: int = 0, fast: bool = False
) -> BatchedExtractor:
    """``fast=True`` routes the forward through the BN-folded bf16
    FastInception (backbones/inception_fast.py — the 5k+ img/s/chip
    extraction path, bf16-tolerance parity vs the flax module); the default
    keeps the f32 flax module for reference float parity."""
    if fast:
        import jax.numpy as jnp

        from tise_tpu.backbones import inception_fast

        fast_model = inception_fast.FastInception(
            dtype=jnp.bfloat16,
            folded=jax.jit(lambda p: inception_fast.fold_tree(p, jnp.bfloat16))(params),
        )

        def apply_fn(p, x):  # folded weights ride the closure; p unused
            out = fast_model(x, endpoints=("pool3",))
            return {"pool3": out["pool3"].astype(jnp.float32)}

    else:
        model = inception_v3.InceptionV3(dtype=dtype or jax.numpy.float32)

        def apply_fn(p, x):
            return model.apply(p, x, endpoints=("pool3",))

    return BatchedExtractor(
        apply_fn,
        params,
        recipe="fid",
        mesh=mesh,
        device_resize_to=299 if device_resize_from else None,
    )


def compute_statistics_of_path(
    path: str,
    extractor: Optional[BatchedExtractor],
    batch_size: int = 64,
    *,
    legacy_compat: bool = False,
    streaming: bool = False,
    host_image_size: int = 299,
    snapshot_path: str = "",
    build_extractor=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """mu/sigma of a folder (or load a cached npz).  Mirrors
    fid_score.py:199-220.  ``host_image_size`` < 299 pairs with a
    device-resize extractor (decode-only host path).  ``snapshot_path``
    makes the extraction drop-tolerant (periodic rows+cursor snapshots +
    in-process backend reset; extractor.run_resumable) — bit-equal result."""
    import os

    if not os.path.exists(path):
        raise RuntimeError(f"Invalid path: {path}")
    if path.endswith(".npz"):
        return result_io.load_stats_npz(path)
    assert extractor is not None
    loader = ImageFolderLoader.from_dir(path, batch_size, host_image_size, drop_last=legacy_compat)
    if loader.num_images() == 0:
        raise RuntimeError(f"No images found under: {path}")
    if snapshot_path:
        from tise_tpu.metrics.extractor import run_resumable

        # drop_last truncation applied to the GLOBAL list up front (the
        # resumable loader restarts mid-list, where a local drop_last would
        # cut at the wrong boundary)
        files = loader.files[: loader.num_images()]
        acts = run_resumable(
            build_extractor or (lambda: extractor),
            files,
            batch_size=batch_size,
            image_size=host_image_size,
            keys=("pool3",),
            snapshot_path=snapshot_path,
        )["pool3"]
    else:
        acts = extractor.run(loader, keys=("pool3",))["pool3"]
    if streaming:
        # device-side sufficient statistics (for very large sets); the default
        # follows the reference and does float64 host covariance on raw acts.
        import jax.numpy as jnp

        state = stats.init_moments(acts.shape[1])
        state = stats.update_moments(state, jnp.asarray(acts))
        return stats.finalize_moments(state)
    return stats.exact_stats(acts)


def calculate_fid_given_paths(
    path1: str,
    path2: str,
    params,
    batch_size: int = 64,
    *,
    mesh=None,
    legacy_compat: bool = False,
    sqrtm_method: str = "scipy",
    device_resize_from: int = 0,
    fast: bool = False,
    snapshot_dir: str = "",
) -> float:
    extractor = None
    build = None
    if not (path1.endswith(".npz") and path2.endswith(".npz")):
        build = lambda: make_pool3_extractor(  # noqa: E731 — rebuilt after a backend reset
            params, mesh=mesh, device_resize_from=device_resize_from, fast=fast
        )
        extractor = build()
    import os

    size = device_resize_from or 299
    snap = (lambda i: os.path.join(snapshot_dir, f"fid_path{i}.snapshot.npz")) if snapshot_dir else (lambda i: "")
    if snapshot_dir:
        os.makedirs(snapshot_dir, exist_ok=True)
    m1, s1 = compute_statistics_of_path(
        path1, extractor, batch_size, legacy_compat=legacy_compat, host_image_size=size,
        snapshot_path=snap(1), build_extractor=build,
    )
    m2, s2 = compute_statistics_of_path(
        path2, extractor, batch_size, legacy_compat=legacy_compat, host_image_size=size,
        snapshot_path=snap(2), build_extractor=build,
    )
    return sqrtm.frechet_distance(m1, s1, m2, s2, method=sqrtm_method)


def save_statistics(
    path: str,
    out_npz: str,
    params,
    batch_size: int = 64,
    *,
    mesh=None,
    legacy_compat: bool = False,
    device_resize_from: int = 0,
    fast: bool = False,
) -> None:
    """Compute mu/sigma of an image folder and cache them in the reference's
    npz layout (fid_score.py:200-203).  The reference ships these files
    pre-computed (FID/data/coco_val.npz etc.) with no command to build one
    for a new dataset — this closes that gap; the npz then serves as
    --path1/--path2 of any later run."""
    extractor = make_pool3_extractor(
        params, mesh=mesh, device_resize_from=device_resize_from, fast=fast
    )
    mu, sigma = compute_statistics_of_path(
        path,
        extractor,
        batch_size,
        legacy_compat=legacy_compat,
        host_image_size=device_resize_from or 299,
    )
    result_io.save_stats_npz(out_npz, mu, sigma)


def load_params(weights_path: Optional[str]):
    """Load converted torchvision weights (npz pytree or torch .pth)."""
    from tise_tpu.core import weights as weights_io

    if weights_path is None:
        raise SystemExit(
            "FID needs InceptionV3 weights: pass --weights pointing to a "
            "torchvision inception_v3 state_dict (.pth) or a converted .npz "
            "(see tise_tpu/core/weights.py)."
        )
    return weights_io.load_inception_params(weights_path)


def main(argv=None) -> None:
    # CLI-compatible flag surface (fid_score.py:51-64) + TPU additions.
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--dims", type=int, default=2048, choices=[2048])
    p.add_argument("-c", "--gpu", default="", type=str, help="ignored (TPU build)")
    p.add_argument("--path1", type=str, required=True)
    p.add_argument("--path2", type=str, default="")
    p.add_argument("--saved_file", type=str, default="")
    p.add_argument(
        "--save_stats",
        type=str,
        default="",
        help="write mu/sigma of --path1 to this npz (reference-stats cache) instead of computing a distance",
    )
    p.add_argument("--weights", type=str, default=None, help="inception weights (.pth/.npz)")
    p.add_argument("--legacy-compat", action="store_true", help="reproduce drop_last tail discard")
    p.add_argument("--sqrtm", type=str, default="scipy", choices=["scipy", "eigh", "ns", "ns-pallas"])
    p.add_argument(
        "--device-resize-from",
        type=int,
        default=0,
        help="source image size; resize 299 happens on-device (fast path, ~PIL parity)",
    )
    p.add_argument(
        "--snapshot_dir",
        type=str,
        default="",
        help="make extraction drop-tolerant: periodic rows+cursor snapshots "
             "under this dir; a dropped/killed run resumes from them "
             "(bit-equal result; see extractor.run_resumable)",
    )
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    if args.save_stats:
        save_statistics(
            args.path1,
            args.save_stats,
            load_params(args.weights),
            args.batch_size,
            legacy_compat=args.legacy_compat,
            device_resize_from=args.device_resize_from,
            fast=args.precision == "fast",
        )
        print(f"stats: {args.save_stats}")
        return
    if not args.path2:
        p.error("--path2 is required (or pass --save_stats to cache statistics of --path1)")
    params = None
    if not (args.path1.endswith(".npz") and args.path2.endswith(".npz")):
        params = load_params(args.weights)
    fid_value = calculate_fid_given_paths(
        args.path1,
        args.path2,
        params,
        args.batch_size,
        legacy_compat=args.legacy_compat,
        sqrtm_method=args.sqrtm,
        device_resize_from=args.device_resize_from,
        fast=args.precision == "fast",
        snapshot_dir=args.snapshot_dir,
    )
    if args.saved_file:
        result_io.write_fid_result(args.saved_file, fid_value)
    print(f"FID: {fid_value}")


if __name__ == "__main__":
    main()
