"""IS* CUB slim path: name-mapping completeness and TF forward parity
(inception_score_star_bird.py:128-201 semantics, proven against an in-env
real-TF oracle with random weights under the exact slim variable names —
including the stale mixed_17x17x1280a scope — no external artifacts)."""

import numpy as np
import pytest

from tf_slim_ref import random_slim_vars, tf_forward_slim

from tise_tpu.backbones import inception_slim

NUM_CLASSES = 51  # 50 bird classes + background (inception_score_star_bird.py:150)


class TestMapping:
    def test_params_load_into_trunk(self):
        import jax
        import jax.numpy as jnp

        from tise_tpu.backbones.inception_v3 import InceptionV3

        variables = random_slim_vars(0, NUM_CLASSES)
        params = inception_slim.params_from_slim_vars(variables, NUM_CLASSES)
        model = InceptionV3(num_classes=NUM_CLASSES, pool_variant="tf")
        ref_shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), endpoints=("logits",)
            )
        )
        got = jax.tree.map(lambda x: x.shape, params["params"])
        want = jax.tree.map(lambda x: tuple(x.shape), ref_shapes["params"])
        assert got == want

    def test_inception_v3_prefix_stripped(self):
        variables = {
            f"inception_v3/{k}": v for k, v in random_slim_vars(0, NUM_CLASSES).items()
        }
        params = inception_slim.params_from_slim_vars(variables, NUM_CLASSES)
        assert "Conv2d_1a_3x3" in params["params"]


class TestForwardParity:
    def test_endpoints_match_tf_oracle(self):
        pytest.importorskip("tensorflow")
        import jax

        from tise_tpu.backbones.inception_v3 import InceptionV3

        variables = random_slim_vars(0, NUM_CLASSES)
        rng = np.random.RandomState(1)
        # already-normalized floats: the bird script's (v/127.5)-1 happens
        # upstream of the graph (inception_score_star_bird.py:64-70)
        x = (rng.rand(2, 299, 299, 3).astype(np.float32) - 0.5) * 2

        ref = tf_forward_slim(variables, x)

        params = inception_slim.params_from_slim_vars(variables, NUM_CLASSES)
        model = InceptionV3(num_classes=NUM_CLASSES, pool_variant="tf")
        got = jax.jit(
            lambda p, xx: model.apply(p, xx, endpoints=("mixed6e", "pool3", "logits"))
        )(params, x)
        np.testing.assert_allclose(np.asarray(got["mixed6e"]), ref["mixed_6e"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["pool3"]), ref["pool3"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["logits"]), ref["logits"], rtol=1e-4, atol=1e-4)
