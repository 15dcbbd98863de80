"""Live-detector provider marshalling (TorchScript path) + preprocess CLI."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from emfusion_tpu.segmentation import (NUM_CLASSES, ReplayMaskProvider,
                                       TorchScriptMaskProvider)


class FakeDetector(torch.nn.Module):
    """Emits one 60x60 detection box with class-3 score 0.9."""

    def forward(self, image):
        H = image.shape[0]
        W = image.shape[1]
        boxes = torch.tensor([[10.0, 10.0, 70.0, 70.0]])
        mask = torch.zeros(1, H, W)
        mask[0, 10:70, 10:70] = 1.0
        scores = torch.zeros(1, 81)
        scores[0, 3] = 0.9
        return boxes, mask, scores


@pytest.fixture
def model_path(tmp_path):
    m = torch.jit.script(FakeDetector())
    p = str(tmp_path / "det.pt")
    m.save(p)
    return p


def test_torchscript_provider(model_path):
    prov = TorchScriptMaskProvider(model_path, score_thresh=0.5)
    rgb = np.zeros((100, 120, 3), np.uint8)
    dets = prov.detect(rgb, 0)
    assert len(dets) == 1
    d = dets[0]
    assert d.class_id == 3
    assert d.scores.shape == (NUM_CLASSES,)
    assert d.mask.sum() == 60 * 60
    # below threshold -> filtered
    prov2 = TorchScriptMaskProvider(model_path, score_thresh=0.95)
    assert prov2.detect(rgb, 0) == []


def test_preprocess_masks_cli(tmp_path, model_path):
    from emfusion_tpu import native
    if not native.available():
        pytest.skip("native codecs unavailable")
    # build a 2-frame TUM-format dir
    seq = tmp_path / "seq"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    lines = []
    for i in range(2):
        rgb = np.zeros((100, 120, 3), np.uint8)
        native.write_png_rgb(str(seq / "rgb" / f"{i}.png"), rgb)
        native.write_png_gray16(str(seq / "depth" / f"{i}.png"),
                                np.full((100, 120), 5000, np.uint16))
        lines.append(f"{i}.0 rgb/{i}.png {i}.0 depth/{i}.png")
    (seq / "associations.txt").write_text("\n".join(lines))

    from emfusion_tpu.apps.preprocess_masks import main
    out = str(tmp_path / "masks")
    rc = main(["-t", str(seq), "-o", out, "--model", model_path,
               "--every", "1", "--score-thresh", "0.5"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "Mask0000.plk"))

    # replayable by the standard provider
    rp = ReplayMaskProvider(out)
    dets = rp.detect(None, 0)
    assert len(dets) == 1 and dets[0].class_id == 3
