"""Live HTTP viewer (emfusion_tpu/viz_server.py): the headless
interactive analogue of the reference's cv::viz 3-D window
(EMFusion.cpp:162-233). Drives a real pipeline, then exercises every
endpoint over localhost."""

import io
import json
import urllib.request

import numpy as np

from emfusion_tpu.config import Params
from emfusion_tpu.pipeline import EMFusionPipeline
from emfusion_tpu.viz_server import LiveViewer
from tests.synthetic import SyntheticScene


def _get(port, path, timeout=20):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_live_viewer_endpoints():
    scene = SyntheticScene(
        H=120, W=160, f=130.0, floor_y=0.75,
        bg_spheres=((np.array([-0.45, 0.05, 1.3]), 0.35),),
        obj_sphere_r=0.0)
    params = Params(frameSize=(160, 120), fx=130.0, fy=130.0,
                    cx=79.5, cy=59.5,
                    globalVolumeDims=(64, 64, 64),
                    globalVoxelSize=2.56 / 64,
                    volumePose=(0.0, 0.0, 1.28),
                    objVolumeDims=(16, 16, 16), max_objects=2)
    pipe = EMFusionPipeline(params, None)
    for f in range(2):
        depth, _ = scene.render(np.eye(4, dtype=np.float32),
                                np.array([9.0, 9.0, 9.0]))
        pipe.process_frame(None, depth)
    pipe.flush()

    viewer = LiveViewer(pipe, port=0, host="127.0.0.1")
    try:
        viewer.publish()

        st, ct, body = _get(viewer.port, "/")
        assert st == 200 and "text/html" in ct
        assert b"emfusion-tpu live" in body

        st, ct, body = _get(viewer.port, "/frame.png")
        assert st == 200 and ct == "image/png"
        from PIL import Image
        img = np.asarray(Image.open(io.BytesIO(body)))
        assert img.shape[:2] == (120, 160)

        # interactive novel view: raycasts the fused model from a
        # user-chosen orbit pose; the scene has geometry, so some
        # pixels must be lit
        st, ct, body = _get(viewer.port,
                            "/view.png?yaw=0.6&pitch=-0.3&dist=0.9")
        assert st == 200 and ct == "image/png"
        img = np.asarray(Image.open(io.BytesIO(body)))
        assert img.shape[:2] == (120, 160)
        assert (img > 0).any(), "orbit view rendered nothing"

        st, ct, body = _get(viewer.port, "/status")
        assert st == 200
        s = json.loads(body)
        assert s["frame"] == 2
        assert s["objects"] == []
        assert len(s["cam_pose"]) == 4

    finally:
        viewer.close()


def test_404_and_close():
    params = Params(frameSize=(32, 24), fx=20.0, fy=20.0, cx=15.5,
                    cy=11.5, globalVolumeDims=(16, 16, 16),
                    globalVoxelSize=0.1, objVolumeDims=(16, 16, 16),
                    max_objects=1)
    pipe = EMFusionPipeline(params, None)
    viewer = LiveViewer(pipe, port=0, host="127.0.0.1")
    try:
        import urllib.error
        try:
            _get(viewer.port, "/nope")
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 404
        assert raised
    finally:
        viewer.close()


def test_scene_mesh_endpoints():
    """The navigable 3-D scene endpoints (r5 — the actual cv::viz
    mesh-scene analogue): /scene serves the inline WebGL viewer,
    /mesh.bin the packed mesh payload (parsed here against its format
    spec), /mesh.ply a loadable PLY."""
    import struct

    scene = SyntheticScene(
        H=120, W=160, f=130.0, floor_y=0.75,
        bg_spheres=((np.array([-0.45, 0.05, 1.3]), 0.35),),
        obj_sphere_r=0.0)
    params = Params(frameSize=(160, 120), fx=130.0, fy=130.0,
                    cx=79.5, cy=59.5,
                    globalVolumeDims=(64, 64, 64),
                    globalVoxelSize=2.56 / 64,
                    volumePose=(0.0, 0.0, 1.28),
                    objVolumeDims=(16, 16, 16), max_objects=2)
    pipe = EMFusionPipeline(params, None)
    depth, _ = scene.render(np.eye(4, dtype=np.float32),
                            np.array([9.0, 9.0, 9.0]))
    pipe.process_frame(None, depth)
    pipe.flush()

    viewer = LiveViewer(pipe, port=0, host="127.0.0.1")
    try:
        st, ct, body = _get(viewer.port, "/scene")
        assert st == 200 and b"webgl" in body.lower()

        # mesh extraction takes tens of seconds on an oversubscribed
        # CI CPU (8 xdist workers) — generous timeout
        st, ct, body = _get(viewer.port, "/mesh.bin", timeout=180)
        assert st == 200
        nm = struct.unpack_from("<I", body, 0)[0]
        assert nm >= 1
        nv, nt = struct.unpack_from("<II", body, 4)
        assert nv > 100 and nt > 100
        verts = np.frombuffer(body, "<f4", count=nv * 3, offset=12
                              ).reshape(nv, 3)
        # bg mesh is in WORLD coordinates: the fused sphere/floor sit
        # in front of the camera around z ~ 1-2 m
        assert 0.0 < np.median(verts[:, 2]) < 3.0
        tris = np.frombuffer(body, "<u4", count=nt * 3,
                             offset=12 + nv * 24).reshape(nt, 3)
        assert tris.max() < nv

        st, ct, body = _get(viewer.port, "/mesh.ply", timeout=180)
        assert st == 200 and body.startswith(b"ply")
    finally:
        viewer.close()
