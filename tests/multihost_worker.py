"""Subprocess worker for tests/test_multihost.py.

Joins a real N-process CPU ``jax.distributed`` cluster, runs the sharded
extraction + RP-style item paths over a shared folder, and saves the
gathered outputs for the parent test to compare against its single-process
oracle.  Must be launched with cwd=repo root (package is not installed).
"""

import sys

import numpy as np


def main() -> None:
    pid, nproc, port, folder = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp

    from tise_tpu.core.data import ImageFolderLoader, list_images
    from tise_tpu.metrics.extractor import BatchedExtractor
    from tise_tpu.parallel import multihost

    def apply_fn(params, x):
        # cheap deterministic "backbone": per-image channel means and maxima
        return {"feat": jnp.concatenate([x.mean(axis=(1, 2)), x.max(axis=(1, 2))], axis=-1)}

    extractor = BatchedExtractor(apply_fn, {}, recipe="fid")
    loader = ImageFolderLoader.from_dir(folder, batch_size=4, image_size=16)
    feat = extractor.run(loader)["feat"]

    # RP-style per-item path: shard items, compute, allgather in order
    files = list_images(folder)
    sel, gidx = multihost.shard_items(files)
    local = np.asarray([float(len(p)) for p in sel])
    lengths = multihost.allgather_rows(local, gidx, len(files))

    # f64 payload: the bytes-gather must preserve the dtype exactly — a
    # jax-array round-trip with x64 disabled would downcast to f32 and lose
    # pi's low mantissa bits (regression: allgather_rows downcast)
    pi_rows = multihost.allgather_rows(gidx.astype(np.float64) + np.pi, gidx, len(files))

    # empty-shard path: 1 work item over N processes — the shard-less
    # process must still enter the same allgathers or the cluster deadlocks
    # (regression: _run_local returns {} for an empty shard)
    one_loader = ImageFolderLoader(files[:1], 4, 16)
    feat_one = extractor.run(one_loader)["feat"]

    np.save(f"{folder}/feat_{pid}.npy", feat)
    np.save(f"{folder}/lens_{pid}.npy", lengths)
    np.save(f"{folder}/pi_{pid}.npy", pi_rows)
    np.save(f"{folder}/feat_one_{pid}.npy", feat_one)
    multihost.barrier("done")
    print(f"[p{pid}] OK", flush=True)


if __name__ == "__main__":
    main()
