"""InceptionV3 (torchvision arch) structure tests: endpoint shapes at 299
match the reference block dims (FID/inception.py:14-19), conversion round-trip,
and the sharded extractor path on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tise_tpu.backbones import inception_v3
from tise_tpu.core.data import Batch
from tise_tpu.core.mesh import make_mesh
from tise_tpu.metrics.extractor import BatchedExtractor


@pytest.fixture(scope="module")
def small_params():
    return inception_v3.random_params(jax.random.PRNGKey(0), num_classes=10)


@pytest.fixture(scope="module")
def model():
    return inception_v3.InceptionV3(num_classes=10)


class TestShapes:
    def test_endpoint_dims(self, model, small_params):
        x = jnp.zeros((2, 299, 299, 3), jnp.float32)
        out = model.apply(small_params, x, endpoints=("maxpool1", "maxpool2", "mixed6e", "pool3", "logits"))
        # reference FID block dims: 64, 192, 768, 2048 (FID/inception.py:14-19)
        assert out["maxpool1"].shape == (2, 73, 73, 64)
        assert out["maxpool2"].shape == (2, 35, 35, 192)
        assert out["mixed6e"].shape == (2, 17, 17, 768)
        assert out["pool3"].shape == (2, 2048)
        assert out["logits"].shape == (2, 10)

    def test_torch_state_dict_roundtrip(self, small_params):
        """Convert params -> synthetic torch-style dict -> params; must match."""

        def walk(tree, prefix=""):
            for k, v in tree.items():
                key = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    yield from walk(v, key)
                else:
                    yield key, np.asarray(v)

        state = {}
        for key, v in walk(small_params["params"]):
            if key.endswith("conv.kernel"):
                state[key.replace("conv.kernel", "conv.weight")] = np.transpose(v, (3, 2, 0, 1))
            elif key.endswith("bn_scale"):
                state[key.replace("bn_scale", "bn.weight")] = v
            elif key.endswith("bn_bias"):
                state[key.replace("bn_bias", "bn.bias")] = v
            elif key.endswith("bn_mean"):
                state[key.replace("bn_mean", "bn.running_mean")] = v
            elif key.endswith("bn_var"):
                state[key.replace("bn_var", "bn.running_var")] = v
            elif key == "fc.kernel":
                state["fc.weight"] = v.T
            elif key == "fc.bias":
                state["fc.bias"] = v
        converted = inception_v3.params_from_torch_state_dict(state, num_classes=10)
        flat_a = dict(walk(small_params["params"]))
        flat_b = dict(walk(converted["params"]))
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(flat_a[k], flat_b[k], err_msg=k)


class TestShardedExtraction:
    def test_multi_device_matches_single(self, model, small_params, rng):
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
        imgs = rng.randint(0, 256, (16, 299, 299, 3)).astype(np.uint8)

        def apply_fn(p, x):
            return model.apply(p, x, endpoints=("pool3",))

        ex8 = BatchedExtractor(apply_fn, small_params, recipe="fid")
        ex1 = BatchedExtractor(apply_fn, small_params, recipe="fid", mesh=make_mesh(devices=jax.devices()[:1]))
        out8 = np.asarray(jax.device_get(ex8(imgs)["pool3"]))
        out1 = np.asarray(jax.device_get(ex1(imgs)["pool3"]))
        np.testing.assert_allclose(out8, out1, rtol=2e-4, atol=2e-4)

    def test_run_drops_padding(self, model, small_params, rng):
        def apply_fn(p, x):
            return model.apply(p, x, endpoints=("pool3",))

        ex = BatchedExtractor(apply_fn, small_params, recipe="fid")
        imgs = rng.randint(0, 256, (8, 299, 299, 3)).astype(np.uint8)
        mask = np.zeros(8, bool)
        mask[:5] = True
        batches = [Batch(images=imgs, mask=mask, paths=[str(i) for i in range(5)])]
        out = ex.run(batches, keys=("pool3",))["pool3"]
        assert out.shape == (5, 2048)


class TestTorchFullForwardParity:
    """VERDICT item: full-forward equivalence vs an independent torch
    transcription of torchvision's inception_v3 (tests/torch_inception_ref.py)
    through the real converter — validates conv/BN/pool/fc numerics AND the
    state_dict key mapping end to end."""

    def test_all_endpoints_match_torch(self, rng):
        torch = pytest.importorskip("torch")
        from tests.torch_inception_ref import random_torch_inception

        tmodel = random_torch_inception(num_classes=10, seed=3)
        sd = tmodel.state_dict()
        params = inception_v3.params_from_torch_state_dict(sd, num_classes=10)
        jmodel = inception_v3.InceptionV3(num_classes=10)

        x = rng.randn(2, 299, 299, 3).astype(np.float32) * 0.5
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        jout = jax.jit(
            lambda p, v: jmodel.apply(p, v, endpoints=tuple(inception_v3.ENDPOINTS))
        )(params, jnp.asarray(x))

        for name in inception_v3.ENDPOINTS:
            t = tout[name].numpy()
            if t.ndim == 4:
                t = np.transpose(t, (0, 2, 3, 1))
            j = np.asarray(jout[name], np.float32)
            scale = max(np.abs(t).max(), 1e-3)
            np.testing.assert_allclose(
                j, t, rtol=1e-4, atol=1e-4 * scale,
                err_msg=f"endpoint {name} diverges from torch",
            )


class TestFastInceptionParity:
    """bf16 throughput path (inception_fast.FastInception: BN folding +
    combined 1x1 fan-out) matches the flax module to bf16 tolerance."""

    def test_fast_forward_matches_flax(self, model, small_params, rng):
        from tise_tpu.backbones.inception_fast import FastInception

        x = jnp.asarray(rng.randn(2, 299, 299, 3).astype(np.float32) * 0.5, jnp.bfloat16)
        bf_model = inception_v3.InceptionV3(num_classes=10, dtype=jnp.bfloat16)
        ref = bf_model.apply(small_params, x, endpoints=("pool3", "logits"))
        fast = FastInception(small_params, jnp.bfloat16)
        got = jax.jit(lambda v: fast(v, endpoints=("pool3", "logits")))(x)
        for k in ("pool3", "logits"):
            r = np.asarray(ref[k], np.float32)
            g = np.asarray(got[k], np.float32)
            scale = max(np.abs(r).max(), 1e-6)
            assert np.abs(r - g).max() / scale < 0.04, f"{k}: {np.abs(r - g).max()} vs scale {scale}"

    def test_input_recipe_fold_matches_external_normalize(self, model, small_params, rng):
        """fold_tree(input_recipe="fid") consumes RAW uint8 and must match the
        f32 path normalize(u8) -> forward (exact affine algebra in conv1a)."""
        from tise_tpu.backbones.inception_fast import FastInception
        from tise_tpu.ops.preprocess import normalize

        u8 = jnp.asarray(rng.randint(0, 256, (2, 299, 299, 3)).astype(np.uint8))
        plain = FastInception(small_params, jnp.float32)
        folded = FastInception(small_params, jnp.float32, input_recipe="fid")
        ref = jax.jit(lambda v: plain(normalize(v, "fid", jnp.float32), endpoints=("pool3", "logits")))(u8)
        got = jax.jit(lambda v: folded(v, endpoints=("pool3", "logits")))(u8)
        for k in ("pool3", "logits"):
            r = np.asarray(ref[k], np.float32)
            g = np.asarray(got[k], np.float32)
            scale = max(np.abs(r).max(), 1e-6)
            np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4 * scale, err_msg=k)
