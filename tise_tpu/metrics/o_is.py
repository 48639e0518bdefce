"""O-IS — object-centric Inception Score over detector crops.

Reference (object_fidelity/O-IS/object_centric_inception_score.py):
  crops folder -> Resize(299) + Normalize(0.5, 0.5) (:87-93)
  -> torchvision InceptionV3 with an 80-class fine-tuned fc
     (transform_input=False, :42-45)
  -> logits / 2.1737587451934814 -> softmax (:55-57)
  -> 10 contiguous splits, exp(mean KL) via scipy entropy (:72-79).

Crop folders are produced by tise_tpu/metrics/crop_objects.py (the TPU port
of object_fidelity/crop_object.py).
"""

from __future__ import annotations

import argparse
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones import inception_v3
from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed,
                                  NUM_SPLITS, O_IS_TEMPERATURE)
from tise_tpu.core.data import ImageFolderLoader
from tise_tpu.metrics.extractor import BatchedExtractor
from tise_tpu.ops import kl


def make_logits_extractor(params, mesh=None, num_classes: int = 80) -> BatchedExtractor:
    model = inception_v3.InceptionV3(num_classes=num_classes)

    def apply_fn(p, x):
        return model.apply(p, x, endpoints=("logits",))

    return BatchedExtractor(apply_fn, params, recipe="half", mesh=mesh)


def compute_o_is(
    image_dir: str,
    extractor: BatchedExtractor,
    *,
    batch_size: int = 32,
    splits: int = NUM_SPLITS,
    snapshot_path: str = "",
    build_extractor=None,
) -> Tuple[float, float]:
    loader = ImageFolderLoader.from_dir(image_dir, batch_size, 299)
    if loader.num_images() == 0:
        raise RuntimeError(f"No images found under: {image_dir}")
    if snapshot_path:
        from tise_tpu.metrics.extractor import run_resumable

        logits = run_resumable(
            build_extractor or (lambda: extractor),
            loader.files,
            batch_size=batch_size,
            image_size=299,
            keys=("logits",),
            snapshot_path=snapshot_path,
        )["logits"]
    else:
        logits = extractor.run(loader, keys=("logits",))["logits"]
    probs = np.asarray(kl.temperature_softmax(jnp.asarray(logits), O_IS_TEMPERATURE))
    return kl.inception_score(probs, splits)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--saved_file", type=str, default="")
    p.add_argument("--gpu_id", type=int, default=0, help="ignored (TPU build)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--weights", type=str, required=True, help="80-class fine-tuned inception (.pth/.npz)")
    p.add_argument("--snapshot_file", type=str, default="",
                   help="make extraction drop-tolerant: periodic rows+cursor "
                        "snapshot at this path (bit-equal result; "
                        "extractor.run_resumable)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    from tise_tpu.core import weights as weights_io

    params = weights_io.load_inception_params(args.weights, num_classes=80)
    build = lambda: make_logits_extractor(params)  # noqa: E731
    extractor = build()
    mean, std = compute_o_is(args.image_dir, extractor, batch_size=args.batch_size,
                             snapshot_path=args.snapshot_file, build_extractor=build)
    if args.saved_file:
        result_io.write_o_is_result(args.saved_file, mean, std)
    print(f"O-IS: {mean} +- {std}")


if __name__ == "__main__":
    main()
