'''Offline attribution of the preview render/encode path (host-only).

Replicates PreviewVideoWriterStep.process on one synthetic 1000-frame chunk
at the bench shapes (404px ROI arena, 80px crops, 1 detection/frame) and
prints per-phase seconds plus a cProfile top list. Pure host work — safe to
run without the chip.

Usage: python benchmarks/preview_attrib.py [--frames 1000] [--profile]
'''
import argparse
import cProfile
import io as _io
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_inputs(n, arena=404, crop=80, k=8):
    rng = np.random.default_rng(0)
    chunk = rng.integers(0, 90, (n, arena, arena), dtype=np.uint8)
    cropped = rng.integers(0, 90, (n, crop, crop), dtype=np.uint8)
    yy, xx = np.mgrid[:crop, :crop]
    mask1 = (((yy - crop / 2) ** 2 + (xx - crop / 2) ** 2) < 30 ** 2)
    masks = np.broadcast_to(mask1, (n, crop, crop)).astype(np.uint8).copy()
    # production ships the arena overlay as 160px window crops + origins
    # (ops/instances.py pack_masks_cropped), not full-frame masks
    win = 160
    arena_crops = np.zeros((n, win, win), np.uint8)
    arena_crops[:, win // 2 - 30:win // 2 + 30, win // 2 - 30:win // 2 + 30] = 1
    cy = (arena / 2 + 60 * np.sin(np.arange(n) / 50)).astype(int)
    arena_origins = np.stack([np.clip(cy - win // 2, 0, arena - win),
                              np.full(n, 180 - win // 2)], axis=1).astype('int32')
    ref_kpts = np.stack([rng.uniform(150, 260, (n, k)),
                         rng.uniform(150, 260, (n, k)),
                         np.full((n, k), 2.0)], axis=-1)
    boxes = np.concatenate([rng.uniform(140, 170, (n, 1, 2)),
                            rng.uniform(240, 280, (n, 1, 2))], axis=-1)
    rot_kpts = rng.uniform(-35, 35, (n, k, 2))
    roi = np.zeros((arena, arena), np.uint8)
    roi[10:-10, 10:-10] = 1
    return dict(chunk=chunk, cropped=cropped, masks=masks,
                arena_crops=arena_crops, arena_origins=arena_origins,
                ref_kpts=ref_kpts, boxes=boxes, rot_kpts=rot_kpts, roi=roi)


def run(inp, out_path, block=128):
    from moseq2_detectron_extract_tpu.io.video import PreviewVideoWriter
    from moseq2_detectron_extract_tpu.viz import (ArenaView,
                                                  CleanedFramesView,
                                                  RotatedKeypointsView,
                                                  stack_videos)
    order = 'bgr'  # production renders BGR-native (pipeline/steps.py)
    writer = PreviewVideoWriter(out_path, fps=30, vmin=0, vmax=100,
                                channel_order=order)
    arena_view = ArenaView(inp['roi'], vmin=0, vmax=100, scale=1.0, order=order)
    rot_view = RotatedKeypointsView(scale=1.5, order=order)
    clean_view = CleanedFramesView(vmin=0, vmax=100, scale=1.5, order=order)
    n = len(inp['chunk'])
    t = {'arena': 0.0, 'clean': 0.0, 'rot': 0.0, 'stack': 0.0, 'encode': 0.0}
    frame_idxs = np.arange(n)
    bufs = {}

    def buf(name, shape):  # persistent block buffers, as in the real step
        b = bufs.get(name)
        if b is None or b.shape[0] < shape[0]:
            b = bufs[name] = np.zeros(shape, np.uint8)
        return b[:shape[0]]

    for s in range(0, n, block):
        e = s + block
        t0 = time.perf_counter()
        m = len(inp['chunk'][s:e])
        ah = inp['chunk'].shape[1]
        ch = int(inp['masks'].shape[1] * 1.5)
        arena = arena_view.render(inp['chunk'][s:e],
                                  mask_crops=inp['arena_crops'][s:e],
                                  mask_origins=inp['arena_origins'][s:e],
                                  keypoints=inp['ref_kpts'][s:e],
                                  boxes=inp['boxes'][s:e],
                                  out=buf('arena', (m, ah, ah, 3)))
        t1 = time.perf_counter()
        clean = clean_view.render(inp['cropped'][s:e], inp['masks'][s:e],
                                  out=buf('clean', (m, ch, ch, 3)))
        t2 = time.perf_counter()
        rot = rot_view.render(inp['masks'][s:e], inp['rot_kpts'][s:e],
                              out=buf('rot', (m, ch, ch, 3)))
        t3 = time.perf_counter()
        left = stack_videos([clean, rot], orientation='vertical',
                            out=buf('left', (m, 2 * ch, ch, 3)))
        composite = stack_videos([left, arena], orientation='horizontal',
                                 out=buf('comp', (m, max(2 * ch, ah), ch + ah, 3)))
        t4 = time.perf_counter()
        writer.write_frames(frame_idxs[s:e], composite, writable=True)
        t5 = time.perf_counter()
        t['arena'] += t1 - t0
        t['clean'] += t2 - t1
        t['rot'] += t3 - t2
        t['stack'] += t4 - t3
        t['encode'] += t5 - t4
    t0 = time.perf_counter()
    writer.close()
    t['encode'] += time.perf_counter() - t0
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=1000)
    ap.add_argument('--profile', action='store_true')
    args = ap.parse_args()
    inp = make_inputs(args.frames)
    out = os.path.join(tempfile.mkdtemp(), 'preview.mp4')

    wall0 = time.perf_counter()
    cpu0 = time.process_time()
    if args.profile:
        prof = cProfile.Profile()
        prof.enable()
    t = run(inp, out)
    if args.profile:
        prof.disable()
    wall = time.perf_counter() - wall0
    cpu = time.process_time() - cpu0

    print(f'frames={args.frames} wall={wall:.2f}s py-cpu={cpu:.2f}s '
          f'({args.frames / wall:.0f} fps)')
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f'  {k:8s} {v:6.2f}s')
    if args.profile:
        s = _io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats('cumulative').print_stats(25)
        print(s.getvalue())


if __name__ == '__main__':
    main()
