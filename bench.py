'''End-to-end extraction throughput benchmark (depth frames / sec / chip).

Measures the BASELINE.md headline metric: full extract pipeline — raw .dat
read, device preprocessing, Mask+Keypoint R-CNN inference, feature
post-processing, crop/rotate, h5 + preview writing — on a synthetic
512x424 Kinect-format session with the production model config.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is fps / 5000 (the driver-set north-star, BASELINE.json).
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

WIDTH, HEIGHT = 512, 424
FLOOR_DEPTH = 700.0
MOUSE_HEIGHT = 50.0
# head bump: a taller disc at the first-keypoint end of the body axis. A
# symmetric ellipse leaves tip-to-tail keypoint order 180-degree ambiguous
# (keypoint AP plateaus near 33 no matter how good the head is — r4
# VERDICT items 3/5); real mice are asymmetric, and the bump makes keypoint
# AP a meaningful gate metric (same device geometry: the model program is
# shape-identical, so throughput numbers are unaffected).
HEAD_HEIGHT = 18.0     # extra height above the body
HEAD_AXIS_FRAC = 0.6   # bump center at -0.6 * major axis (keypoint-0 end)
MOUSE_AXES = (40, 18)  # ellipse semi-axes in arena pixels
BASELINE_FPS = 5000.0


def draw_mouse(canvas_shape, cx, cy, ang_deg, axes=MOUSE_AXES):
    '''(body_mask, head_mask) uint8 for one synthetic mouse: rotated ellipse
    body + head bump disc at the keypoint-0 end of the major axis.'''
    import cv2
    body = np.zeros(canvas_shape, dtype='uint8')
    cv2.ellipse(body, (int(cx), int(cy)), axes, ang_deg, 0, 360, 1, -1)
    ca, sa = np.cos(np.radians(ang_deg)), np.sin(np.radians(ang_deg))
    hx = cx - HEAD_AXIS_FRAC * axes[0] * ca
    hy = cy - HEAD_AXIS_FRAC * axes[0] * sa
    head = np.zeros(canvas_shape, dtype='uint8')
    cv2.circle(head, (int(hx), int(hy)), max(int(axes[1] * 1.25), 4), 1, -1)
    return body, head


def make_background():
    frame = np.zeros((HEIGHT, WIDTH), dtype='float64')
    yy, xx = np.mgrid[0:HEIGHT, 0:WIDTH]
    arena = (xx - WIDTH / 2) ** 2 + (yy - HEIGHT / 2) ** 2 < (HEIGHT / 2 - 10) ** 2
    frame[arena] = FLOOR_DEPTH
    frame[~arena] = 500.0
    return frame


def write_session(dirname, nframes, seed=0):
    import cv2
    os.makedirs(dirname, exist_ok=True)
    rng = np.random.default_rng(seed)
    bg = make_background()
    block = 200  # write in blocks to bound memory
    path = os.path.join(dirname, 'depth.dat')
    with open(path, 'wb') as fh:
        for start in range(0, nframes, block):
            n = min(block, nframes - start)
            frames = np.repeat(bg[None], n, axis=0)
            for i in range(n):
                t = (start + i) / max(nframes - 1, 1)
                cx = int(WIDTH / 2 + 100 * np.cos(2 * np.pi * t))
                cy = int(HEIGHT / 2 + 80 * np.sin(2 * np.pi * t))
                ang = 360.0 * t
                body, head = draw_mouse((HEIGHT, WIDTH), cx, cy, ang)
                frames[i][body > 0] = FLOOR_DEPTH - MOUSE_HEIGHT
                frames[i][head > 0] = FLOOR_DEPTH - MOUSE_HEIGHT - HEAD_HEIGHT
            frames = frames + rng.normal(0, 1.0, frames.shape)
            fh.write(np.clip(frames, 0, 65535).astype('<u2').tobytes())
    with open(os.path.join(dirname, 'metadata.json'), 'w') as fh:
        json.dump({'DepthResolution': [WIDTH, HEIGHT]}, fh)
    np.savetxt(os.path.join(dirname, 'depth_ts.txt'),
               np.arange(nframes) * (1000.0 / 30.0), fmt='%.3f')
    return path


def build_config(output_dir, predictor, nframes):
    return {
        'model': None, 'checkpoint': 'last', 'batch_size': predictor.batch_size,
        'instance_threshold': 0.0, 'expected_instances': 1,
        'allowed_detections': 4,
        'bg_roi_dilate': (10, 10), 'bg_roi_shape': 'ellipse', 'bg_roi_index': 0,
        'bg_roi_weights': (1, .1, 1), 'bg_roi_depth_range': (650, 750),
        'bg_roi_gradient_filter': False, 'bg_roi_gradient_threshold': 3000,
        'bg_roi_gradient_kernel': 7, 'bg_roi_fill_holes': True,
        'use_plane_bground': False, 'output_dir': output_dir,
        'frame_dtype': 'uint8', 'min_height': 0, 'max_height': 100,
        'crop_size': (80, 80), 'frame_trim': (0, 0),
        'chunk_size': int(os.environ.get('BENCH_CHUNK_SIZE', 1000)),
        'chunk_overlap': 0, 'fps': 30, 'use_tracking': True,
        'debug_feature_processing': False, 'use_tracking_model': False,
        'device_input': os.environ.get('BENCH_DEVICE_INPUT', 'full'),
        'flip_classifier': 'bench-model', 'dataset_name': 'moseq',
        'show_progress': False, 'predictor': predictor,
    }


def run_extract(session_path, predictor, output_dir, bground):
    from moseq2_detectron_extract_tpu.extract import extract_session
    from moseq2_detectron_extract_tpu.io.session import Session

    session = Session(session_path)
    session._bground_im = bground  # synthetic sessions are too short to
    # self-estimate a background from every-500th frame
    config = build_config(output_dir, predictor, session.nframes)
    status = extract_session(session, config)
    from moseq2_detectron_extract_tpu.io.util import read_yaml
    status_data = read_yaml(status)
    if not status_data.get('complete', False):
        raise RuntimeError('benchmark extraction did not complete')
    return session.nframes, status_data.get('stage_stats', {}), session


def measure_device_infer_fps(predictor, frame_shape, nframes=1000, reps=3):
    '''Model-compute-only throughput: device-resident input, device-resident
    output, timed after a compile warmup. All ``reps`` dispatches are queued
    asynchronously and blocked ONCE at the end, so the ~26 ms tunnel RTT of
    this sandbox is paid once per measurement instead of once per rep
    (VERDICT r4: three dispatch-blocked reps of 4 batches under-reported the
    fast variants by ~44%%).'''
    import jax
    import jax.numpy as jnp
    h, w = frame_shape
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (nframes, h, w), dtype=np.uint8))
    jax.block_until_ready(frames)
    out = predictor(frames, return_device=True)   # warmup / compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [predictor(frames, return_device=True) for _ in range(reps)]
    jax.block_until_ready(outs)
    return reps * nframes / (time.perf_counter() - t0)


def measure_device_slope_fps(predictor, frame_shape, inner=8):
    '''RTT-immune device throughput of the pipeline's actual inference
    program (predictor step + fused instance selection), via the slope
    method of benchmarks/device_attrib.py:timed_device_loop: the program
    runs n times inside ONE jitted fori_loop (iterations chained through an
    epsilon input perturbation so XLA cannot hoist or dedupe; the carry
    folds EVERY output leaf so no head is dead-code-eliminated), at n=1 and
    n=``inner``; (t_hi - t_lo) / (inner - 1) cancels every fixed cost —
    tunnel RTT, dispatch, the result scalar's D2H — exactly. This is the
    per-chip number the v5e deployment sustains (VERDICT r4 item 1).'''
    import jax.numpy as jnp
    from benchmarks.device_attrib import timed_device_loop
    h, w = frame_shape
    b = predictor.batch_size
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (b, h, w), dtype=np.uint8))
    sizes = jnp.zeros((b, 2), jnp.float32)  # unused by the program below
    dt = timed_device_loop(
        lambda p, x, s: predictor._step_impl(x.astype(jnp.uint8), (h, w),
                                             with_select=True),
        predictor.params, frames, sizes, inner=inner)
    return b / dt


def measure_rtt_ms(reps=20):
    '''Host<->device round-trip latency: median wall time of a 1-scalar D2H
    sync. ~0.05 ms on a local chip, ~26 ms through this sandbox's tunnel —
    the single best environment-health discriminator for the record.'''
    import jax.numpy as jnp
    x = jnp.float32(1.0) + 1.0
    float(x)  # materialize + first sync
    samples = []
    for i in range(reps):
        y = x + float(i)   # fresh tiny computation per probe
        t0 = time.perf_counter()
        float(y)
        samples.append(time.perf_counter() - t0)
    return 1000.0 * sorted(samples)[len(samples) // 2]


def measure_read_depth_standalone(session, config, nframes):
    '''CPU seconds to run the producer stage's host work (raw .dat read +
    C++ prep) standalone, with nothing else contending for the core. The
    pipeline's 'Read Depth Data' cpu_s divided by this is the cache/core
    contention factor: ~1x on a healthy multi-core host, 5-10x when the
    1-vCPU sandbox is degraded (README round-4; VERDICT r4 item 8).'''
    from moseq2_detectron_extract_tpu.ops.preprocess import prep_raw_frames_host
    from moseq2_detectron_extract_tpu.io.session import Stream
    c0 = time.thread_time()
    t0 = time.perf_counter()
    n_read = 0
    for _, frames in session.iterate(chunk_size=config['chunk_size'],
                                     streams=(Stream.DEPTH,)):
        prep_raw_frames_host(np.asarray(frames),
                             bground_im=session.bground_im,
                             roi=session.roi,
                             vmin=config['min_height'],
                             vmax=config['max_height'],
                             dtype=config['frame_dtype'])
        n_read += len(frames)
        if n_read >= nframes:
            break
    return {'cpu_s': round(time.thread_time() - c0, 3),
            'wall_s': round(time.perf_counter() - t0, 3),
            'nframes': n_read}


def measure_transfer_ceilings(frame_shape, nframes=1000, reps=3):
    '''Tunnel bandwidth ceilings expressed as fps for this workload's actual
    per-frame transfer volumes: H2D = prepped uint8 ROI chunk; D2H = 80x80
    uint8 crops + bit-packed masks + small per-frame vectors (~7 KB).'''
    import jax
    import jax.numpy as jnp
    h, w = frame_shape
    chunk = np.zeros((nframes, h, w), dtype=np.uint8)
    jax.block_until_ready(jnp.asarray(chunk))  # any one-time setup cost
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(jnp.asarray(chunk))
    h2d_s = (time.perf_counter() - t0) / reps

    # fresh device arrays per rep: jax caches an array's host copy, so timing
    # repeated np.asarray of the same array measures nothing
    crops = jnp.zeros((nframes, 80, 80), jnp.uint8)
    packed = jnp.zeros((nframes, 80, 10), jnp.uint8)
    vecs = jnp.zeros((nframes, 64), jnp.float32)
    sets = [jax.block_until_ready((crops + i, packed + i, vecs + i))
            for i in range(reps + 1)]
    np.asarray(sets[0][0]), np.asarray(sets[0][1]), np.asarray(sets[0][2])
    t0 = time.perf_counter()
    for c, p, v in sets[1:]:
        np.asarray(c), np.asarray(p), np.asarray(v)
    d2h_s = (time.perf_counter() - t0) / reps
    return {
        'h2d_fps': nframes / h2d_s,
        'h2d_mb_s': chunk.nbytes / 1e6 / h2d_s,
        'd2h_fps': nframes / d2h_s,
        'd2h_mb_s': (crops.nbytes + packed.nbytes + vecs.nbytes) / 1e6 / d2h_s,
    }


def warm_guest_pages(gb: int = 8, max_seconds: float = 420.0) -> float:
    '''Pre-fault a bench-sized memory pool so the measured extraction runs on
    host-backed pages.

    This sandbox is a Firecracker microVM whose host demand-pages guest
    memory lazily; under host memory pressure a COLD guest page fault was
    measured at ~300 us (2026-08-19: fresh 200 MB fill = 17 s cold vs 28 ms
    warm — a 3x swing on the whole e2e bench). Pages touched once stay
    host-backed after free, so touching a pool up front moves that
    infrastructure cost outside the timed window. On a healthy host the
    probe detects cheap faults and skips (~0.1 s).'''
    t0 = time.perf_counter()
    probe = np.empty(64 << 20, np.uint8)
    probe[::4096] = 1
    if time.perf_counter() - t0 < 0.15:   # healthy: ~64 MB faults in <150 ms
        return 0.0
    arena = np.empty(gb << 30, np.uint8)
    view = arena.reshape(gb, 1 << 30)
    for g in range(gb):
        if time.perf_counter() - t0 > max_seconds:
            break
        view[g, ::4096] = 1
    del arena
    return time.perf_counter() - t0


def _emit_placeholder_record():
    '''Print a labeled placeholder headline IMMEDIATELY so a benchmark record
    exists even if the run below is killed by the driver's timeout
    (round-2 lesson: BENCH_r02 was lost to rc=124 with no JSON at all).
    The real result overwrites it as a later line — the driver keeps the
    last parseable line.'''
    print(json.dumps({
        'metric': 'extract_throughput', 'value': 0.0,
        'unit': 'frames/sec/chip', 'vs_baseline': 0.0,
        'note': 'placeholder emitted at startup; run did not reach the '
                'measured result before being killed if this is the last line',
    }), flush=True)


def _start_wedge_watchdog():
    '''A tunnel flake can WEDGE an in-flight jax process permanently while
    fresh connections work (observed 2026-08-21: two runs stuck right after
    backend init; a concurrent probe said the TPU was fine). A wedged bench
    would otherwise burn the driver's whole capture window and leave only
    the startup placeholder; this daemon thread emits a labeled record and
    exits hard once the wall budget passes without a completed run.'''
    import threading
    budget = float(os.environ.get('BENCH_WALL_BUDGET', 1500))
    state = {'stage': 'e2e', 'done': threading.Event()}

    def fire():
        if state['done'].wait(budget):
            return
        if state['stage'] == 'e2e':
            # no headline yet: leave a labeled record, then free the window
            print(json.dumps({
                'metric': 'extract_throughput', 'value': 0.0,
                'unit': 'frames/sec/chip', 'vs_baseline': 0.0,
                'note': f'watchdog: e2e did not complete within '
                        f'{budget:.0f}s — wedged tunnel connection suspected '
                        '(fresh connections may still work; rerun). '
                        'See BENCH_WALL_BUDGET.',
            }), flush=True)
            os._exit(3)
        # headline already printed: exit SILENTLY so it stays the last
        # parseable line instead of a wedge in the extras eating the window
        os._exit(0)

    threading.Thread(target=fire, daemon=True).start()
    return state


def main():
    import tempfile
    import logging
    _emit_placeholder_record()
    _watchdog_done = _start_wedge_watchdog()
    from moseq2_detectron_extract_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # repeat runs skip the multi-minute jit compile
    warmed = warm_guest_pages(
        max_seconds=float(os.environ.get('BENCH_WARM_PAGES_BUDGET', 150)))
    if warmed:
        print(f'# warmed cold guest pages for {warmed:.0f}s '
              f'(degraded-host mitigation; excluded from the timed window)',
              file=sys.stderr, flush=True)
    from moseq2_detectron_extract_tpu.io.util import setup_logging
    setup_logging(level=logging.INFO)   # stage timings reach per-run log files
    logging.getLogger().handlers[0].setLevel(logging.WARNING)  # quiet console

    import jax
    from moseq2_detectron_extract_tpu.models.config import ModelConfig
    from moseq2_detectron_extract_tpu.models.predictor import Predictor
    from moseq2_detectron_extract_tpu.models.rcnn import MaskKeypointRCNN

    nframes = int(os.environ.get('BENCH_FRAMES', 3000))
    batch_size = int(os.environ.get('BENCH_BATCH', 64))

    # BENCH_MODEL: a trained model dir. Defaults to the COMMITTED shipping
    # deployment, benchmarks/bench_model_fast160 — the AP-gated 160-canvas /
    # 48-proposal variant (trained + gated on the chip, FAST_VARIANT.md;
    # keypoint-teeth gate in fast_variant_gate.py GATE_SET=headbump). The
    # headline therefore describes ONE configuration end to end: the same
    # weights whose device program the extras measure (VERDICT r4 item 4).
    # Falls back to the faithful 256-canvas checkpoint
    # (benchmarks/bench_model) when the fast artifact is absent. Set
    # BENCH_MODEL=random for the old random-init mode (detections capped at
    # 1; same compute per frame — the whole pipeline is static-shape).
    model_dir = os.environ.get('BENCH_MODEL')
    if os.environ.get('BENCH_TINY') and not model_dir:
        # an explicit BENCH_MODEL always wins over the tiny fallback shape
        model_dir = 'tiny'
    if model_dir == 'tiny':
        # last-resort shape: tiny model, random weights — only used by the
        # CPU fallback so a labeled record exists when the device tunnel is
        # dead; the value is NOT comparable to the TPU headline
        cfg = ModelConfig(
            image_size=64, resnet_stage_blocks=(1, 1, 1, 1), resnet_width=16,
            fpn_channels=32, box_fc_dim=32, mask_conv_dims=(16,),
            keypoint_conv_dims=(16,), rpn_pre_nms_topk_test=64,
            rpn_post_nms_topk_test=16, test_detections_per_image=2)
        model = MaskKeypointRCNN(cfg)
        import jax.numpy as jnp
        images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images,
                            method=MaskKeypointRCNN.inference)
        predictor = Predictor(cfg, params, batch_size=batch_size,
                              score_threshold=0.0)
        weights_used = 'random-init tiny config (BENCH_TINY)'
    else:
        if not model_dir:
            bench_root = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), 'benchmarks')
            for name in ('bench_model_fast160', 'bench_model'):
                committed = os.path.join(bench_root, name)
                if os.path.exists(os.path.join(committed, 'params_f16.npz')):
                    model_dir = committed
                    break
        if model_dir and model_dir != 'random':
            predictor = Predictor.from_model_dir(
                model_dir, batch_size=batch_size, score_threshold=0.5)
            weights_used = model_dir
        else:
            cfg = ModelConfig(test_detections_per_image=1)
            model = MaskKeypointRCNN(cfg)
            import jax.numpy as jnp
            images = jnp.zeros((1, cfg.image_size, cfg.image_size, 3),
                               jnp.float32)
            params = model.init(jax.random.PRNGKey(0), images,
                                method=MaskKeypointRCNN.inference)
            predictor = Predictor(cfg, params, batch_size=batch_size,
                                  score_threshold=0.0)
            weights_used = 'random-init (BENCH_MODEL=random)'

    work = tempfile.mkdtemp(prefix='bench_')
    bground = make_background()

    # warmup session: identical geometry -> identical compiled shapes. One
    # chunk is enough — every chunk shares one compiled shape (pad_chunks).
    warm_frames = int(os.environ.get('BENCH_WARM_FRAMES', 200))
    warm_path = write_session(os.path.join(work, 'warm'), warm_frames)
    run_extract(warm_path, predictor, os.path.join(work, 'warm_out'), bground)

    main_path = write_session(os.path.join(work, 'main'), nframes)
    t0 = time.time()
    n, stage_stats, session = run_extract(
        main_path, predictor, os.path.join(work, 'main_out'), bground)
    elapsed = time.time() - t0
    fps = n / elapsed

    # headline FIRST — the driver's capture window must always see this line
    # even if the attribution extras below run long (the reference always
    # prints its fps summary: m2de/extract.py:135-137)
    headline = {
        'metric': 'extract_throughput',
        'value': round(fps, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 4),
        'stage_busy_s': {k: round(v['busy_s'], 2)
                         for k, v in stage_stats.items()},
        # wall busy is contention-inflated on a 1-core host and includes
        # device waits; cpu_s is the thread's actual host compute
        'stage_cpu_s': {k: round(v.get('cpu_s', 0.0), 2)
                        for k, v in stage_stats.items()},
        'elapsed_s': round(elapsed, 2),
        'nframes': n,
        'weights': weights_used,
    }
    if os.environ.get('BENCH_CPU_FALLBACK'):
        headline['backend'] = 'cpu-fallback (device tunnel unreachable)'
    print(json.dumps(headline), flush=True)
    _watchdog_done['stage'] = 'extras'  # headline recorded: a wedge in the
    # extras now exits silently at the budget instead of losing the record

    if os.environ.get('BENCH_NO_EXTRAS'):
        _watchdog_done['done'].set()
        return

    # attribution extras: the e2e number above is tunnel-bound in this
    # sandbox; these separate model compute from transfer ceilings and
    # carry the environment-health discriminators (VERDICT r4 items 1+8).
    # Printed as a second, superset JSON line — either line parses
    # standalone.
    from moseq2_detectron_extract_tpu.ops.preprocess import bbox_from_roi
    bbox = bbox_from_roi(session.roi)
    frame_shape = (bbox[1][0] - bbox[0][0], bbox[1][1] - bbox[0][1])
    extras = {**headline}

    # -- environment-health discriminators: attribute an e2e swing to the
    # sandbox vs the code without reading log prose --------------------------
    try:
        extras['rtt_ms'] = round(measure_rtt_ms(), 3)
    except Exception as exc:  # noqa: BLE001
        extras['rtt_ms'] = f'failed: {str(exc)[:80]}'
    try:
        standalone = measure_read_depth_standalone(
            session, build_config(work, predictor, n), n)
        extras['read_depth_standalone'] = standalone
        pipe_cpu = stage_stats.get('Read Depth Data', {}).get('cpu_s', 0.0)
        if standalone['cpu_s'] > 0 and standalone['nframes']:
            # normalize to the same frame count before comparing
            scale = n / standalone['nframes']
            extras['read_depth_contention_x'] = round(
                pipe_cpu / (standalone['cpu_s'] * scale), 2)
    except Exception as exc:  # noqa: BLE001
        extras['read_depth_standalone'] = f'failed: {str(exc)[:120]}'
    extras['stage_sub_times'] = {k: v['sub_times']
                                 for k, v in stage_stats.items()
                                 if 'sub_times' in v}

    # -- device program throughput: slope-measured (RTT-immune) for the
    # headline weights plus every committed variant, with the 32-batch
    # async-dispatch number as a cross-check -------------------------------
    extras['device_fps_method'] = (
        'slope: program n-times inside one jitted fori_loop at n=1 and n=8, '
        '(t8-t1)/7 — cancels tunnel RTT/dispatch exactly; carry folds all '
        'output leaves (benchmarks/device_attrib.py:timed_device_loop). '
        'dispatch32: 32 batches async-dispatched, blocked once.')
    try:
        extras['device_infer_fps_dispatch32'] = round(measure_device_infer_fps(
            predictor, frame_shape, nframes=batch_size * 8, reps=4), 2)
    except Exception as exc:  # noqa: BLE001
        extras['device_infer_fps_dispatch32'] = f'failed: {str(exc)[:120]}'
    ceilings = measure_transfer_ceilings(frame_shape)
    extras.update({
        'h2d_ceiling_fps': round(ceilings['h2d_fps'], 2),
        'h2d_mb_s': round(ceilings['h2d_mb_s'], 2),
        'd2h_ceiling_fps': round(ceilings['d2h_fps'], 2),
        'd2h_mb_s': round(ceilings['d2h_mb_s'], 2),
    })
    # guarded per variant — never let one failure (or a cold compile on a
    # degraded tunnel) take down the record
    bench_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              'benchmarks')
    for key, name in (('faithful_device_fps', 'bench_model'),
                      ('fast_variant_device_fps', 'bench_model_fast'),
                      ('fast160_variant_device_fps', 'bench_model_fast160')):
        var_dir = os.path.join(bench_root, name)
        if (not os.path.exists(os.path.join(var_dir, 'params_f16.npz'))
                or os.environ.get('BENCH_NO_FAST_VARIANT')):
            continue
        try:
            from moseq2_detectron_extract_tpu.models.predictor import \
                Predictor as _P
            if os.path.abspath(var_dir) == os.path.abspath(str(weights_used)):
                var_pred = predictor   # headline weights: reuse, don't reload
            else:
                var_pred = _P.from_model_dir(var_dir, batch_size=batch_size,
                                             score_threshold=0.5)
            extras[key] = round(
                measure_device_slope_fps(var_pred, frame_shape), 2)
        except Exception as exc:  # noqa: BLE001
            extras[key] = f'failed: {str(exc)[:120]}'

    print(json.dumps(extras), flush=True)
    _watchdog_done['done'].set()


def _device_init_hangs() -> bool:
    '''Probe device-backend init in a subprocess with a hard timeout.

    The tunneled TPU backend can hang indefinitely at init when the tunnel
    is down (observed 2026-08-17: jax.devices() never returns). A hung init
    cannot be cancelled in-process, so probe in a child first.
    '''
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            capture_output=True, timeout=int(os.environ.get(
                'BENCH_DEVICE_PROBE_TIMEOUT', 150)))
        return probe.returncode != 0
    except subprocess.TimeoutExpired:
        return True


def _apply_cpu_fallback_env(env) -> None:
    '''Mutate ``env`` for the degraded CPU-fallback re-exec: tiny model
    shape, short run, no extras — a labeled record instead of a hang.'''
    env['BENCH_CPU_FALLBACK'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    env.setdefault('BENCH_TINY', '1')  # CPU can't run the R50
    env.pop('BENCH_MODEL', None)       # R50 weights can't run either
    env.setdefault('BENCH_FRAMES', '300')
    env.setdefault('BENCH_WARM_FRAMES', '100')
    env.setdefault('BENCH_BATCH', '20')
    env.setdefault('BENCH_NO_EXTRAS', '1')


if __name__ == '__main__':
    # a benchmark record must exist even when the device tunnel is dead:
    # fall back to the CPU backend on a small frame count and say so in the
    # JSON rather than hanging into the driver's window (round-2 lesson).
    if (not os.environ.get('BENCH_CPU_FALLBACK')
            and os.environ.get('JAX_PLATFORMS', '') != 'cpu'
            and _device_init_hangs()):
        _apply_cpu_fallback_env(os.environ)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    if os.environ.get('JAX_PLATFORMS', '') == 'cpu':
        # the axon site hook force-prepends the device platform over the env
        # var; pin CPU explicitly whenever CPU was requested (fallback or a
        # manual JAX_PLATFORMS=cpu run with the tunnel down)
        import jax
        jax.config.update('jax_platforms', 'cpu')
    main()
