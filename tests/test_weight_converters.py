"""Checkpoint-converter round-trips with synthetic state dicts: the slim
(IS*) variable mapping, the detectron2 pickle layout, the CountSeg counter,
and CLIP's OpenAI state_dict — each must load into the Flax models and run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _walk(tree, prefix=""):
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _walk(v, key)
        else:
            yield key, np.asarray(v)


class TestSlimConverter:
    def _synth_slim_vars(self, rng, num_classes=51):
        """Build a slim-named variable dict by walking our own random params
        backwards through the mapping tables."""
        from tise_tpu.backbones import inception_slim as sl
        from tise_tpu.backbones import inception_v3 as iv3

        params = iv3.random_params(jax.random.PRNGKey(0), num_classes=num_classes)["params"]
        flat = {}

        def conv_entry(scope, tree):
            flat[f"{scope}/weights"] = np.asarray(tree["conv"]["kernel"])
            flat[f"{scope}/BatchNorm/beta"] = np.asarray(tree["bn_bias"])
            flat[f"{scope}/BatchNorm/gamma"] = np.asarray(tree["bn_scale"])
            flat[f"{scope}/BatchNorm/moving_mean"] = np.asarray(tree["bn_mean"])
            flat[f"{scope}/BatchNorm/moving_variance"] = np.asarray(tree["bn_var"])

        for scope, mod in sl._STEM.items():
            conv_entry(scope, params[mod])
        for scope, mod in sl._MIXED.items():
            for sub, name in sl._BRANCHES[sl._BLOCK_KIND[mod]].items():
                conv_entry(f"{scope}/{sub}", params[mod][name])
        flat["logits/logits/weights"] = np.asarray(params["fc"]["kernel"])
        flat["logits/logits/biases"] = np.asarray(params["fc"]["bias"])
        return params, flat

    def test_round_trip(self, rng):
        from tise_tpu.backbones import inception_slim as sl

        params, flat = self._synth_slim_vars(rng)
        restored = sl.params_from_slim_vars(flat, num_classes=51)["params"]
        a = dict(_walk(params))
        b = dict(_walk(restored))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], err_msg=k)

    def test_cub_extractor_slices_background(self, rng, tmp_path):
        from tise_tpu.backbones import inception_slim as sl

        _params, flat = self._synth_slim_vars(rng)
        np.savez(tmp_path / "slim.npz", **flat)
        ex = sl.make_logits_extractor(str(tmp_path / "slim.npz"), flavor="cub")
        imgs = rng.randint(0, 256, (8, 299, 299, 3)).astype(np.uint8)
        out = np.asarray(jax.device_get(ex(imgs)["logits"]))
        assert out.shape == (8, 50)  # 51 classes minus background

    def test_coco_extractor_matmul_head(self, rng, tmp_path):
        from tise_tpu.backbones import inception_slim as sl

        _params, flat = self._synth_slim_vars(rng, num_classes=51)
        flat = {k: v for k, v in flat.items() if not k.startswith("logits/")}
        flat["softmax/weights"] = rng.randn(2048, 1008).astype(np.float32)
        np.savez(tmp_path / "slim_coco.npz", **flat)
        ex = sl.make_logits_extractor(str(tmp_path / "slim_coco.npz"), flavor="coco")
        imgs = rng.randint(0, 256, (8, 299, 299, 3)).astype(np.uint8)
        out = np.asarray(jax.device_get(ex(imgs)["logits"]))
        assert out.shape == (8, 1008)


class TestDetectron2Converter:
    def _synth_sd(self, rng):
        """Minimal-but-complete detectron2-named state dict (random)."""
        sd = {}

        def conv_bn(prefix, cin, cout, k):
            sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
            sd[f"{prefix}.norm.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}.norm.bias"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.norm.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.norm.running_var"] = np.ones(cout, np.float32)

        def conv(prefix, cin, cout, k):
            sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
            sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

        def dense(prefix, cin, cout):
            sd[f"{prefix}.weight"] = rng.randn(cout, cin).astype(np.float32) * 0.01
            sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

        conv_bn("backbone.bottom_up.stem.conv1", 3, 64, 7)
        stages = {"res2": (64, 64, 256, 3), "res3": (256, 128, 512, 4), "res4": (512, 256, 1024, 6), "res5": (1024, 512, 2048, 3)}
        for name, (cin, w, cout, n) in stages.items():
            for i in range(n):
                p = f"backbone.bottom_up.{name}.{i}"
                conv_bn(f"{p}.conv1", cin if i == 0 else cout, w, 1)
                conv_bn(f"{p}.conv2", w, w, 3)
                conv_bn(f"{p}.conv3", w, cout, 1)
                if i == 0:
                    conv_bn(f"{p}.shortcut", cin, cout, 1)
        for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
            conv(f"backbone.fpn_lateral{lvl}", cin, 256, 1)
            conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
        conv("proposal_generator.rpn_head.conv", 256, 256, 3)
        conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1)
        conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1)
        dense("roi_heads.box_head.fc1", 256 * 49, 1024)
        dense("roi_heads.box_head.fc2", 1024, 1024)
        dense("roi_heads.box_predictor.cls_score", 1024, 81)
        dense("roi_heads.box_predictor.bbox_pred", 1024, 320)
        return sd

    def test_convert_and_forward(self, rng):
        from tise_tpu.backbones.detection.rcnn import FasterRCNN
        from tise_tpu.backbones.detection.weights import params_from_detectron2

        params = params_from_detectron2(self._synth_sd(rng))
        model = FasterRCNN()
        det = model.apply(params, jnp.zeros((192, 192, 3), jnp.float32))
        assert det.boxes.shape == (100, 4)
        assert det.classes.shape == (100,)

    def test_structure_matches_init(self, rng):
        from tise_tpu.backbones.detection.rcnn import FasterRCNN
        from tise_tpu.backbones.detection.weights import params_from_detectron2

        converted = params_from_detectron2(self._synth_sd(rng))
        model = FasterRCNN()
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((192, 192, 3), jnp.float32))
        a = {k: v.shape for k, v in _walk(init["params"])}
        b = {k: v.shape for k, v in _walk(converted["params"])}
        assert a == b


class TestCounterConverter:
    def test_convert_and_forward(self, rng):
        from tise_tpu.backbones import counter

        sd = {}

        def conv_bn(conv_key, bn_key, cin, cout, k):
            sd[f"{conv_key}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
            sd[f"{bn_key}.weight"] = np.ones(cout, np.float32)
            sd[f"{bn_key}.bias"] = np.zeros(cout, np.float32)
            sd[f"{bn_key}.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{bn_key}.running_var"] = np.ones(cout, np.float32)

        conv_bn("conv1", "bn1", 3, 64, 7)
        stages = {"layer1": (64, 64, 256, 3), "layer2": (256, 128, 512, 4), "layer3": (512, 256, 1024, 6), "layer4": (1024, 512, 2048, 3)}
        for name, (cin, w, cout, n) in stages.items():
            for i in range(n):
                p = f"{name}.{i}"
                conv_bn(f"{p}.conv1", f"{p}.bn1", cin if i == 0 else cout, w, 1)
                conv_bn(f"{p}.conv2", f"{p}.bn2", w, w, 3)
                conv_bn(f"{p}.conv3", f"{p}.bn3", w, cout, 1)
                if i == 0:
                    conv_bn(f"{p}.downsample.0", f"{p}.downsample.1", cin, cout, 1)
        sd["classifier.weight"] = rng.randn(240, 2048, 1, 1).astype(np.float32) * 0.01
        sd["classifier.bias"] = np.zeros(240, np.float32)

        params = counter.params_from_countseg(sd)
        model = counter.FCResNet50PRM()
        conf, density = model.apply(params, jnp.zeros((1, 224, 224, 3), jnp.float32))
        assert conf.shape == (1, 80)
        assert density.shape[:2] == (1, 80)
