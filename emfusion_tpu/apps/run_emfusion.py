"""EM-Fusion CLI — mirrors the reference app's flag surface
(``apps/EM-Fusion.cpp:217-256``):

  --tumdir/-t      TUM RGB-D sequence directory (with associations.txt)
  --dir/-d         Co-Fusion style directory (Color%04d.png/Depth%04d.exr)
  --colordir / --depthdir   subdirectory names for -d
  --exportdir/-e   write results (poses, meshes, renderings)
  --export-volume  also dump raw TSDF volumes
  --config/-c      INI config file (reference config format)
  --maskdir/-m     replay preprocessed masks (Mask%04d.plk)
  --background     headless (no GUI display)
  --show-slam      reserved (3D visualization not implemented; renders 2D)

plus TPU-native additions: --frames (limit), --platform (tpu|cpu),
--profile (jax profiler trace dir).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time


def build_parser():
    ap = argparse.ArgumentParser("emfusion-tpu")
    ap.add_argument("--tumdir", "-t", help="TUM RGB-D directory")
    ap.add_argument("--dir", "-d", dest="dir_", help="Co-Fusion directory")
    ap.add_argument("--colordir", default="colour")
    ap.add_argument("--depthdir", default="depth_noise")
    ap.add_argument("--exportdir", "-e", help="export results here")
    ap.add_argument("--export-volume", action="store_true")
    ap.add_argument("--config", "-c", help="INI config file")
    ap.add_argument("--maskdir", "-m", help="preprocessed mask dir")
    ap.add_argument("--background", action="store_true",
                    help="run headless (no display)")
    ap.add_argument("--show-slam", action="store_true")
    ap.add_argument("--turntable", type=int, default=0, metavar="N",
                    help="after the run, render N orbit views of the "
                         "fused model (turntable/ under --exportdir) — "
                         "the headless stand-in for the reference's "
                         "cv::viz 3-D window")
    ap.add_argument("--frame-meshes", type=int, default=0, metavar="N",
                    help="export per-frame meshes every N frames "
                         "(frame_meshes/ tree)")
    ap.add_argument("--frames", type=int, default=None,
                    help="process at most N frames")
    ap.add_argument("--serve", type=int, default=0, metavar="PORT",
                    help="run the live HTTP viewer on PORT: MJPEG "
                         "stream of the model rendering + interactive "
                         "orbit views of the fused model "
                         "(emfusion_tpu/viz_server.py — the headless "
                         "analogue of the reference's cv::viz window)")
    ap.add_argument("--serve-host", default="127.0.0.1",
                    help="bind address for --serve (default loopback; "
                         "the viewer has no auth -- use 0.0.0.0 only "
                         "on trusted networks)")
    ap.add_argument("--platform", default=None, choices=["tpu", "cpu"],
                    help="force JAX platform")
    ap.add_argument("--profile", help="jax profiler trace directory")
    ap.add_argument("--checkpoint", help="checkpoint file (.npz)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="write --checkpoint every N frames")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint if it exists")
    return ap


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(name)s: %(message)s")
    args = build_parser().parse_args(argv)
    if not args.tumdir and not args.dir_:
        print("error: need --tumdir or --dir", file=sys.stderr)
        return 2

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compilation cache: compiles dominate cold starts on the
    # remote-compile TPU stack (minutes per program). TPU-only: cached
    # CPU AOT results are machine-feature-sensitive.
    if args.platform != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.cache/jax_comp"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    from emfusion_tpu.distributed.mesh import initialize_multihost
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("EMF_MULTIHOST"):
        if initialize_multihost():
            print(f"multihost: process {jax.process_index()}/"
                  f"{jax.process_count()}")

    from emfusion_tpu.config import Params, load_config, load_calibration
    from emfusion_tpu.io.readers import TUMReader, CoFusionReader
    from emfusion_tpu.io.writers import write_results
    from emfusion_tpu.pipeline import EMFusionPipeline
    from emfusion_tpu.segmentation import ReplayMaskProvider

    params = Params()
    if args.config:
        params = load_config(args.config, params)

    if args.tumdir:
        reader = TUMReader(args.tumdir)
        calib = os.path.join(args.tumdir, "calibration.txt")
    else:
        reader = CoFusionReader(args.dir_, args.colordir, args.depthdir)
        calib = os.path.join(args.dir_, "calibration.txt")
    if os.path.exists(calib):
        params = load_calibration(calib, params)
    reader.init()
    # frame size comes from the DATA, not the config default (the
    # reference reads cv::Mat sizes from the stream; a config/dataset
    # mismatch here used to crash the first reshape)
    probe = reader.peek() if hasattr(reader, "peek") else None
    if probe is not None:
        dh, dw = probe.depth.shape[:2]
        if (dw, dh) != tuple(params.frameSize):
            print(f"frameSize {tuple(params.frameSize)} -> dataset "
                  f"({dw}, {dh})")
            import dataclasses as _dc
            params = _dc.replace(params, frameSize=(dw, dh))

    provider = ReplayMaskProvider(args.maskdir) if args.maskdir else None
    # multi-device runs: build the (obj, z) mesh and shard the pipeline
    # state over it — the distributed analogue of the reference's
    # per-object CUDA streams (SURVEY.md §2.4); the frame loop then
    # uses the shard_map fusion / sharded marching cubes.
    mesh = None
    if len(jax.devices()) > 1:
        from emfusion_tpu.distributed.mesh import make_mesh
        mesh = make_mesh()
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"over {mesh.size} devices")
    pipe = EMFusionPipeline(params, provider,
                            save_output=bool(args.exportdir), mesh=mesh)

    skip_until = 0
    if args.checkpoint and args.resume and os.path.exists(args.checkpoint):
        from emfusion_tpu.checkpoint import load_checkpoint
        load_checkpoint(pipe, args.checkpoint)
        skip_until = pipe.frame
        print(f"resumed from {args.checkpoint} at frame {skip_until}")

    viewer = None
    if args.serve:
        from emfusion_tpu.viz_server import LiveViewer
        viewer = LiveViewer(pipe, port=args.serve, host=args.serve_host)
        print(f"live viewer: http://localhost:{viewer.port}/")

    if args.profile:
        jax.profiler.start_trace(args.profile)

    t_start = time.time()
    n = 0
    frame_times = []
    try:
        # one-frame lookahead so the next depth's host->device upload
        # overlaps the current frame's queued device work (reference
        # analogue: the reader thread keeps I/O off the frame loop,
        # RGBDReader.cpp:72-117; on a tunneled device the H2D copy is
        # the same class of off-loop work)
        stop = False

        def do_frame(frame):
            nonlocal n, stop
            t_f = time.time()
            pipe.process_frame(frame.rgb, frame.depth,
                               timestamp=frame.timestamp)
            frame_times.append(time.time() - t_f)
            if viewer is not None:
                viewer.publish()
            if args.exportdir:
                pipe.outputs["renderings"][n] = pipe.render()
                if args.frame_meshes and \
                        pipe.frame % args.frame_meshes == 0:
                    from emfusion_tpu.io.writers import write_frame_meshes
                    write_frame_meshes(
                        pipe, os.path.join(args.exportdir, "frame_meshes"),
                        pipe.frame)
            n += 1
            if (args.checkpoint and args.checkpoint_every
                    and pipe.frame % args.checkpoint_every == 0):
                from emfusion_tpu.checkpoint import save_checkpoint
                save_checkpoint(pipe, args.checkpoint)
            if n % 10 == 0:
                fps = n / (time.time() - t_start)
                print(f"frame {n}/{reader.num_frames}  "
                      f"{fps:.2f} fps  objects={pipe.active_object_ids}",
                      flush=True)
            if args.frames and n >= args.frames:
                stop = True

        pending = None
        for nxt in reader.frames():
            if nxt.index < skip_until:
                continue
            if pending is not None:
                pipe.prefetch_depth(nxt.depth)
                do_frame(pending)
                if stop:
                    pending = None
                    break
            pending = nxt
        if pending is not None and not stop:
            do_frame(pending)
    finally:
        reader.close()
        if args.profile:
            jax.profiler.stop_trace()

    elapsed = time.time() - t_start
    print(f"processed {n} frames in {elapsed:.1f}s "
          f"({n / max(elapsed, 1e-9):.2f} fps)")
    if len(frame_times) >= 6:
        import statistics
        tail = frame_times[len(frame_times) // 2:]
        steady = statistics.median(tail)
        print(f"steady-state: {steady * 1e3:.0f} ms/frame "
              f"({1.0 / max(steady, 1e-9):.2f} fps, median of last "
              f"{len(tail)} frames)")
    print(pipe.timer.summary(), file=sys.stderr)

    if args.exportdir:
        write_results(pipe, args.exportdir,
                      export_volumes=args.export_volume)
        if args.turntable > 0:
            from emfusion_tpu.viz import render_turntable, save_frames
            frames_tt = render_turntable(pipe, n_views=args.turntable)
            tt_dir = os.path.join(args.exportdir, "turntable")
            os.makedirs(tt_dir, exist_ok=True)
            save_frames(frames_tt, os.path.join(tt_dir, "view%03d.png"))
        print(f"results written to {args.exportdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
