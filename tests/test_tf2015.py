"""IS* COCO 2015-GraphDef path: name-mapping completeness and TF forward
parity (inception_score_star_coco.py:84-108 semantics, proven against an
in-env TF oracle with random weights — no external artifacts needed)."""

import numpy as np
import pytest

from tf2015_ref import random_2015_consts, tf_forward_2015

from tise_tpu.backbones import inception_slim


class TestMapping:
    def test_synthetic_consts_cover_every_expected_name(self):
        consts = random_2015_consts(0)
        assert inception_slim.missing_2015_names(consts) == []
        assert inception_slim.is_2015_layout(consts)

    def test_params_load_into_trunk(self):
        import jax
        import jax.numpy as jnp

        from tise_tpu.backbones.inception_v3 import InceptionV3

        consts = random_2015_consts(0)
        params = inception_slim.params_from_2015_vars(consts)
        model = InceptionV3(num_classes=1008, pool_variant="tf2015")
        ref_shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), endpoints=("pool3",))
        )
        got = jax.tree.map(lambda x: x.shape, params["params"])
        want = jax.tree.map(lambda x: tuple(x.shape), ref_shapes["params"])
        want.pop("fc", None)  # 2015 head is the separate softmax/weights matmul
        assert got == want


class TestForwardParity:
    @pytest.fixture(scope="class")
    def consts(self):
        return random_2015_consts(0)

    def test_logits_match_tf_oracle(self, consts):
        tf = pytest.importorskip("tensorflow")  # noqa: F841
        import jax
        import jax.numpy as jnp

        from tise_tpu.backbones.inception_v3 import InceptionV3
        from tise_tpu.ops.preprocess import normalize

        rng = np.random.RandomState(1)
        img_u8 = rng.randint(0, 256, (2, 299, 299, 3)).astype(np.uint8)

        ref = tf_forward_2015(consts, img_u8.astype(np.float32))

        params = inception_slim.params_from_2015_vars(consts)
        w = jnp.asarray(consts["softmax/weights"])
        model = InceptionV3(num_classes=1008, pool_variant="tf2015")
        x = normalize(jnp.asarray(img_u8), "is_star_2015")
        pool3 = model.apply(params, x, endpoints=("pool3",))["pool3"]
        got = np.asarray(pool3 @ w)

        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_extractor_loads_raw_pb_export(self, consts, tmp_path):
        """make_logits_extractor(flavor='coco') consumes the raw pb-export
        (2015 node names) directly — no manual slim renaming step."""
        path = str(tmp_path / "coco2015.npz")
        np.savez(path, **consts)
        ext = inception_slim.make_logits_extractor(path, flavor="coco")
        assert ext.recipe == "is_star_2015"
        kernel = ext.params["params"]["Mixed_7c"]["branch_pool"]["conv"]["kernel"]
        np.testing.assert_array_equal(np.asarray(kernel), consts["mixed_10/tower_2/conv/conv2d_params"])
