"""Live viewer server: state endpoint, loop gating, System integration.

Parity: reference Viewer camera-follow + step mode
(/root/reference/src/Viewer.cc:160-191, 326-334) as a headless-safe
HTTP viewer (viz_server.ViewerServer).
"""
import json
import threading
import time
import urllib.request

import numpy as np

from orbslam3_tpu import viz_server
from orbslam3_tpu.pipeline import system as slam_system
from test_pipeline_e2e import HW, K4, SyntheticWorld, camera_path


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.read()


class TestViewerServer:
    def test_state_and_controls_with_live_system(self):
        world = SyntheticWorld(seed=2)
        poses = camera_path(30)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        viewer = viz_server.ViewerServer(port=0)
        viewer.attach(sys_)
        try:
            for i in range(14):
                R_cw, t_cw, _ = poses[i]
                sys_.track_monocular(None, ts=i * 0.05,
                                     features=world.frame(R_cw, t_cw))
            assert sys_.state == slam_system.OK
            # the index page serves the self-contained viewer
            page = _get(viewer.port, "/").decode()
            assert "orbslam3_tpu viewer" in page and "fetch(" in page
            # the state endpoint reflects the live map
            st = json.loads(_get(viewer.port, "/state.json"))
            assert st["n_kf"] >= 2 and st["n_pts"] > 100
            assert len(st["points"]) > 100 and len(st["traj"]) > 5
            assert st["cam"] is not None and st["state"] == slam_system.OK
            # trajectory tail matches the system's last pose
            np.testing.assert_allclose(
                st["cam"], sys_.trajectory[-1][2], atol=1e-3)

            # step-mode gating: pause via HTTP, verify the tracking loop
            # blocks, then 'step' releases exactly one frame
            _get(viewer.port, "/control?cmd=pause")
            done = threading.Event()

            def run_one(idx):
                R_cw, t_cw, _ = poses[idx]
                sys_.track_monocular(None, ts=idx * 0.05,
                                     features=world.frame(R_cw, t_cw))
                done.set()

            th = threading.Thread(target=run_one, args=(14,), daemon=True)
            th.start()
            time.sleep(0.4)
            assert not done.is_set(), "tracking loop did not pause"
            _get(viewer.port, "/control?cmd=step")
            th.join(timeout=10)
            assert done.is_set(), "step did not release the frame"
            # still paused after the single step
            assert viewer.paused
            _get(viewer.port, "/control?cmd=resume")
            assert not viewer.paused
        finally:
            viewer.stop()

    def test_frame_stream_serves_changing_overlay(self):
        """FrameDrawer parity in the live viewer (VERDICT r4 missing
        #4): /frame.png serves a PNG of the current tracked frame with
        the keypoint overlay, and it CHANGES as frames advance."""
        rng = np.random.default_rng(4)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(64, 96), min_init_matches=80,
            ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        viewer = viz_server.ViewerServer(port=0, frame_every=1)
        viewer.attach(sys_)
        world = SyntheticWorld(seed=2)
        poses = camera_path(8)
        try:
            pngs = []
            for i in range(6):
                R_cw, t_cw, _ = poses[i]
                # pass a (tiny) pixel image alongside precomputed
                # features so publish_frame has a frame to annotate
                img = rng.integers(0, 255, (64, 96)).astype(np.uint8)
                sys_.track_monocular(img, ts=i * 0.05,
                                     features=world.frame(R_cw, t_cw))
                pngs.append(_get(viewer.port, "/frame.png"))
            assert pngs[-1][:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
            assert pngs[-1] != pngs[0], "frame stream never updated"
            # overlay present: annotated PNG has colored pixels (the
            # grayscale source would compress to a single-channel-like
            # palette; the green/blue rings force RGB variation)
            from io import BytesIO

            from PIL import Image
            arr = np.asarray(Image.open(BytesIO(pngs[-1])).convert("RGB"))
            chan_diff = np.abs(arr[..., 1].astype(int) -
                               arr[..., 2].astype(int)).max()
            assert chan_diff > 50, "no colored keypoint overlay drawn"
        finally:
            viewer.stop()
