"""Live-detector integration: a real TorchScript raw-head graph through
the FULL path — model -> TorchScriptMaskProvider -> postprocess_raw
(class-specific box refinement, per-class NMS, box-matched score rows,
28x28 mask unmolding) -> pipeline spawning on a real-sized frame.

The module is structurally Mask R-CNN-shaped (conv backbone, proposal
grid, ROI-pooled features, 81-class softmax head, per-class box deltas,
28x28 mask-head crops; reference ``apps/maskrcnn.in.py:83-117`` +
``MaskRCNN.cpp:202-234``). Its readout weights are constructed so bright
blobs score as class 3 ("car") — a deterministic detector that actually
fires, unlike a random-init stub, so the test can assert detections flow
into object spawning end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from emfusion_tpu.config import Params  # noqa: E402
from emfusion_tpu.pipeline import EMFusionPipeline  # noqa: E402
from emfusion_tpu.segmentation import (  # noqa: E402
    NUM_CLASSES, TorchScriptMaskProvider,
)
from synthetic import SyntheticScene  # noqa: E402

H, W = 480, 640


class RawHeadMaskRCNN(torch.nn.Module):
    """Raw-head detector: emits (proposals, probs, deltas, mask crops)."""

    GY, GX = 4, 5   # proposal grid

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.c1 = torch.nn.Conv2d(3, 16, 5, stride=4, padding=2)
        self.c2 = torch.nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.obj = torch.nn.Conv2d(32, 1, 1)
        self.cls = torch.nn.Linear(32, NUM_CLASSES)
        self.box = torch.nn.Linear(32, NUM_CLASSES * 4)
        with torch.no_grad():
            # backbone channel 0 chain = brightness average (the rest of
            # the channels keep their random init — a real conv graph)
            self.c1.weight[0].fill_(1.0 / (3 * 25))
            self.c1.bias[0].fill_(0.0)
            self.c2.weight[0].fill_(0.0)
            self.c2.weight[0, 0].fill_(1.0 / 9)
            self.c2.bias[0].fill_(0.0)
            # objectness map: sharp sigmoid on brightness
            self.obj.weight.fill_(0.0)
            self.obj.weight[0, 0].fill_(8.0)
            self.obj.bias.fill_(-3.0)
            # class head: class 3 ("car") reads ROI brightness
            self.cls.weight.fill_(0.0)
            self.cls.bias.fill_(0.0)
            self.cls.weight[3, 0].fill_(60.0)
            self.cls.bias[3].fill_(-12.0)
            self.cls.bias[0].fill_(1.0)
            # small nonzero per-class deltas exercise the refinement math
            self.box.weight.fill_(0.0)
            self.box.bias.uniform_(-0.3, 0.3)

    def forward(self, image):
        x = image.to(torch.float32).permute(2, 0, 1).unsqueeze(0) / 255.0
        f = torch.relu(self.c1(x))
        f = torch.relu(self.c2(f))                 # (1, 32, H/8, W/8)
        omap = torch.sigmoid(self.obj(f))[0, 0]    # (H/8, W/8)
        H8, W8 = int(f.shape[2]), int(f.shape[3])
        props, pooled, crops = [], [], []
        for gy in range(self.GY):
            for gx in range(self.GX):
                cy = (gy + 0.5) / self.GY
                cx = (gx + 0.5) / self.GX
                y1, y2 = max(cy - 0.225, 0.0), min(cy + 0.225, 1.0)
                x1, x2 = max(cx - 0.2, 0.0), min(cx + 0.2, 1.0)
                props.append(torch.tensor([y1, x1, y2, x2]))
                iy1, iy2 = int(y1 * H8), max(int(y2 * H8), int(y1 * H8) + 1)
                ix1, ix2 = int(x1 * W8), max(int(x2 * W8), int(x1 * W8) + 1)
                pooled.append(f[0, :, iy1:iy2, ix1:ix2].mean(dim=(1, 2)))
                crop = omap[iy1:iy2, ix1:ix2][None, None]
                crops.append(F.interpolate(
                    crop, size=(28, 28), mode="bilinear",
                    align_corners=False)[0, 0])
        proposals = torch.stack(props)
        P = torch.stack(pooled)
        probs = torch.softmax(self.cls(P), dim=1)
        deltas = (0.05 * torch.tanh(self.box(P))).reshape(
            -1, NUM_CLASSES, 4)
        masks = torch.stack(crops)
        return proposals, probs, deltas, masks


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    m = RawHeadMaskRCNN().eval()
    example = torch.zeros(H, W, 3, dtype=torch.uint8)
    traced = torch.jit.trace(m, example)
    p = str(tmp_path_factory.mktemp("det") / "rawhead.pt")
    traced.save(p)
    return p


def _scene_frame(scene, cam, obj_c):
    depth, mask = scene.render(cam, obj_c)
    rgb = np.full((H, W, 3), 12, np.uint8)    # dark background
    rgb[mask] = 250                            # bright object blob
    return rgb, depth, mask


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(
        H=H, W=W, f=525.0, floor_y=0.8,
        bg_spheres=((np.array([-0.6, 0.0, 2.0]), 0.55),
                    (np.array([0.7, -0.5, 2.4]), 0.4)),
        obj_sphere_r=0.2)


def test_raw_head_provider_detects(model_path, scene):
    """Provider -> postprocess_raw on the scripted graph: one class-3
    detection with a full 81-class score row, refined box, and an
    unmolded (box-pasted) mask covering the blob."""
    prov = TorchScriptMaskProvider(model_path, score_thresh=0.7)
    cam = np.eye(4, dtype=np.float32)
    rgb, depth, mask = _scene_frame(scene, cam, np.array([0.1, 0.1, 1.3]))
    dets = prov.detect(rgb, 0)
    assert len(dets) >= 1
    d = max(dets, key=lambda d: d.mask.sum())
    assert d.class_id == 3
    assert d.scores.shape == (NUM_CLASSES,)
    assert d.box is not None and len(d.box) == 4
    # unmolded mask overlaps the true silhouette substantially
    inter = np.count_nonzero(d.mask & mask)
    assert inter > 0.5 * np.count_nonzero(mask), \
        (inter, np.count_nonzero(mask))


def test_raw_head_detections_spawn_object(model_path, scene):
    """Full live path on real-sized frames: the raw-head detections must
    produce an object in the pipeline (initOrMatchObjs -> spawn) and
    survive a tracked frame."""
    prov = TorchScriptMaskProvider(model_path, score_thresh=0.7)
    params = Params(
        frameSize=(W, H), fx=525.0, fy=525.0, cx=W / 2 - 0.5,
        cy=H / 2 - 0.5, globalVolumeDims=(128, 128, 128),
        globalVoxelSize=5.12 / 128, volumePose=(0.0, 0.0, 2.56),
        objVolumeDims=(32, 32, 32), maxTrackingIter=20,
        raycast_max_steps=256, max_objects=4, maskRCNNFrames=30,
        tracking_stride=3, estep_scale=2)
    pipe = EMFusionPipeline(params, prov)
    for f in range(2):
        th = 0.002 * f
        c, s = np.cos(th), np.sin(th)
        cam = np.array([[c, 0, s, 0.004 * f], [0, 1, 0, 0],
                        [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)
        obj_c = np.array([0.1, 0.1, 1.3 + 0.004 * f])
        rgb, depth, _ = _scene_frame(scene, cam, obj_c)
        pipe.process_frame(rgb, depth)
    assert pipe.active_object_ids, "live detections did not spawn"
    oid = pipe.active_object_ids[0]
    meta = pipe.meta[oid]
    assert meta.class_probs is not None
    assert int(np.argmax(meta.class_probs)) == 3
