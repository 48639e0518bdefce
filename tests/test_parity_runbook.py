"""Smoke for the one-command parity runbook (tools/parity_check.py --all):
synthetic checkpoints saved in the reference weights layout drive the
registry end to end — present checkpoints run their check and report OK,
absent ones SKIP (VERDICT r3 item 9; real-checkpoint tolerances are
documented in the parity_check module docstring)."""

import functools
import importlib.util
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity_check():
    spec = importlib.util.spec_from_file_location(
        "parity_check", os.path.join(REPO, "tools", "parity_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["parity_check"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pc():
    return _load_parity_check()


@pytest.fixture(scope="module")
def weights_root(tmp_path_factory):
    """Synthetic checkpoints for the NEW runbook wrappers, saved under the
    tise_tpu.benchmark.WEIGHTS layout (the same generators the hermetic
    oracle tests use)."""
    torch = pytest.importorskip("torch")
    from tf2015_ref import random_2015_consts
    from tf_slim_ref import random_slim_vars
    from torch_inception_ref import TorchInceptionV3
    from torch_rcnn_ref import build_synthetic_state_dict

    from tise_tpu.benchmark import WEIGHTS

    root = tmp_path_factory.mktemp("weights")

    def path(key):
        p = root / WEIGHTS[key]
        p.parent.mkdir(parents=True, exist_ok=True)
        return str(p)

    # damsm-text: torch embedding + bi-LSTM layout (small dims)
    ntoken, ninput, nhidden = 30, 16, 8
    emb = torch.nn.Embedding(ntoken, ninput)
    lstm = torch.nn.LSTM(ninput, nhidden, 1, batch_first=True, bidirectional=True)
    sd = {"encoder.weight": emb.weight.detach()}
    sd.update({f"rnn.{k}": v.detach() for k, v in lstm.state_dict().items()})
    torch.save(sd, path("damsm_text"))

    # damsm-image: torchvision-layout inception trunk + emb heads
    trunk = TorchInceptionV3(num_classes=10).state_dict()
    nef = 32
    g = torch.Generator().manual_seed(0)
    trunk["emb_features.weight"] = torch.randn(nef, 768, 1, 1, generator=g) * 0.05
    trunk["emb_cnn_code.weight"] = torch.randn(nef, 2048, generator=g) * 0.05
    trunk["emb_cnn_code.bias"] = torch.randn(nef, generator=g) * 0.01
    torch.save(trunk, path("damsm_image"))

    # IS* CUB slim vars / IS* COCO 2015 consts (npz — converted-checkpoint form)
    np.savez(path("inception_cub"), **random_slim_vars(0, 51))
    np.savez(path("inception_2015"), **random_2015_consts(0))

    # detector: detectron2-layout pkl (sharpened gains -> detections exist)
    det_sd = build_synthetic_state_dict(seed=0, rpn_gain=5.0, cls_gain=0.01)
    with open(path("detector_crop"), "wb") as f:
        pickle.dump({"model": det_sd}, f)

    # counter: CountSeg resnet50 + 240-channel classifier layout
    rng = np.random.RandomState(0)
    csd = {}

    def conv_bn(conv_key, bn_key, cin, cout, k):
        csd[f"{conv_key}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
        csd[f"{bn_key}.weight"] = np.ones(cout, np.float32)
        csd[f"{bn_key}.bias"] = np.zeros(cout, np.float32)
        csd[f"{bn_key}.running_mean"] = np.zeros(cout, np.float32)
        csd[f"{bn_key}.running_var"] = np.ones(cout, np.float32)

    conv_bn("conv1", "bn1", 3, 64, 7)
    stages = {"layer1": (64, 64, 256, 3), "layer2": (256, 128, 512, 4),
              "layer3": (512, 256, 1024, 6), "layer4": (1024, 512, 2048, 3)}
    for name, (cin, w, cout, n) in stages.items():
        for i in range(n):
            p = f"{name}.{i}"
            conv_bn(f"{p}.conv1", f"{p}.bn1", cin if i == 0 else cout, w, 1)
            conv_bn(f"{p}.conv2", f"{p}.bn2", w, w, 3)
            conv_bn(f"{p}.conv3", f"{p}.bn3", w, cout, 1)
            if i == 0:
                conv_bn(f"{p}.downsample.0", f"{p}.downsample.1", cin, cout, 1)
    csd["classifier.weight"] = rng.randn(240, 2048, 1, 1).astype(np.float32) * 0.01
    csd["classifier.bias"] = np.zeros(240, np.float32)
    torch.save(csd, path("counter"))

    return str(root)


NEW_WRAPPERS = {"damsm-text", "damsm-image", "inception-cub", "inception-2015",
                "detector-crop", "counter"}


class TestRunbook:
    def test_all_skip_on_empty_root(self, pc, tmp_path):
        results = pc.run_all(str(tmp_path))
        assert len(results) == 10  # full registry listed
        assert set(results.values()) == {"SKIP"}

    def test_new_wrappers_pass_on_synthetic_checkpoints(self, pc, weights_root, monkeypatch):
        """Every wrapper this round added runs green through the one-command
        driver.  (check_inception / check_clip are byte-for-byte the
        single-target checks the suite already parity-tests at unit level —
        test_inception.py / test_text_backbones.py.)  The detection probe is
        shrunk to the suite's oracle size; real runs keep the 320px default."""
        monkeypatch.setattr(pc, "check_detection",
                            functools.partial(pc.check_detection, size=128))
        results = pc.run_all(weights_root, only=NEW_WRAPPERS)
        assert results == {name: "OK" for name in NEW_WRAPPERS}

    def test_fail_is_reported_not_raised(self, pc, weights_root, tmp_path, monkeypatch):
        """A corrupt checkpoint must land as FAIL in the table (and a nonzero
        exit from main), not abort the other checks."""
        from tise_tpu.benchmark import WEIGHTS

        bad = tmp_path / WEIGHTS["damsm_text"]
        bad.parent.mkdir(parents=True, exist_ok=True)
        bad.write_bytes(b"not a checkpoint")
        results = pc.run_all(str(tmp_path), only={"damsm-text"})
        assert results == {"damsm-text": "FAIL"}
