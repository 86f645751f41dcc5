'''Mocked-subprocess coverage for the ffmpeg pipe paths in io/video.py.

ffmpeg is not installed in the CI image, so the compressed-video reader /
writer / prober / preview paths (reference: m2de/io/video.py ffprobe
:163-219, ffv1 writer :223-276, ffmpeg reader :279-354, preview h264
:519-555) normally have zero runtime coverage. These tests fake
subprocess.run / subprocess.Popen to exercise command construction, pipe
byte handling, frame-range coalescing, scatter into the output array, and
error propagation — everything except ffmpeg's own codec work.
'''
import io
import os
import subprocess as real_subprocess

import numpy as np
import pytest

from moseq2_detectron_extract_tpu.io import video as V

REAL_RUN = real_subprocess.run


def fake_only(handler):
    '''Wrap a fake subprocess.run so only /fake/* commands are intercepted.

    `V.subprocess` IS the stdlib module, so patching its `run` is global —
    numpy et al. still need the real one (e.g. lscpu probes).
    '''
    def run(command, *args, **kwargs):
        if isinstance(command, (list, tuple)) and command and \
                str(command[0]).startswith('/fake/'):
            return handler(command)
        return REAL_RUN(command, *args, **kwargs)
    return run

W, H = 6, 4
FPS = 30


class FakeCompleted:
    def __init__(self, stdout=b'', stderr=b'', returncode=0):
        self.stdout, self.stderr, self.returncode = stdout, stderr, returncode


class FakePipe:
    def __init__(self):
        self.stdin = io.BytesIO()
        self.closed = False
        self.waited = False

        def close():
            self.closed = True
            self.stdin.seek(0)   # keep the buffer readable for assertions
        self.stdin.close = close

    def wait(self):
        self.waited = True
        return 0


@pytest.fixture
def with_fake_ffmpeg(monkeypatch):
    monkeypatch.setattr(V, 'FFMPEG', '/fake/ffmpeg')
    monkeypatch.setattr(V, 'FFPROBE', '/fake/ffprobe')


class TestRequireGate:
    def test_raises_without_ffmpeg(self, monkeypatch):
        monkeypatch.setattr(V, 'FFMPEG', None)
        monkeypatch.setattr(V, 'FFPROBE', None)
        monkeypatch.setattr(V, '_CV2_FFMPEG', False)  # also no cv2 fallback
        with pytest.raises(RuntimeError, match='ffmpeg/ffprobe not available'):
            V.get_video_info('x.avi')
        with pytest.raises(RuntimeError, match='ffmpeg/ffprobe not available'):
            V.write_frames('x.avi', np.zeros((1, H, W), 'uint16'))
        with pytest.raises(RuntimeError, match='ffmpeg/ffprobe not available'):
            V.read_frames('x.avi')


class TestGetVideoInfo:
    def test_parses_ffprobe_output(self, with_fake_ffmpeg, monkeypatch):
        calls = []
        stdout = os.linesep.join(
            ['ffv1', str(W), str(H), 'gray16le', '30/1', '17']).encode()

        def handler(command):
            calls.append(command)
            return FakeCompleted(stdout=stdout)

        monkeypatch.setattr(V.subprocess, 'run', fake_only(handler))
        info = V.get_video_info('movie.avi')
        assert info['codec'] == 'ffv1'
        assert info['pixel_format'] == 'gray16le'
        assert info['dims'] == (W, H)
        assert info['fps'] == 30.0
        assert info['nframes'] == 17
        assert calls[0][0] == '/fake/ffprobe'
        assert 'movie.avi' in calls[0]

    def test_ffprobe_failure_raises(self, with_fake_ffmpeg, monkeypatch):
        monkeypatch.setattr(
            V.subprocess, 'run',
            fake_only(lambda command: FakeCompleted(stderr=b'boom',
                                                    returncode=1)))
        with pytest.raises(RuntimeError, match='ffprobe failed: boom'):
            V.get_video_info('movie.avi')


class TestWriteFrames:
    def test_pipes_exact_bytes_and_closes(self, with_fake_ffmpeg, monkeypatch):
        pipes, commands = [], []

        def fake_popen(command, stdin, stderr):
            commands.append(command)
            pipe = FakePipe()
            pipes.append(pipe)
            return pipe

        monkeypatch.setattr(V.subprocess, 'Popen', fake_popen)
        frames = np.arange(3 * H * W, dtype='uint16').reshape(3, H, W)
        result = V.write_frames('out.avi', frames, fps=FPS)
        assert result is None                       # close_pipe=True
        (pipe,) = pipes
        assert pipe.closed and pipe.waited
        written = pipe.stdin.getvalue()
        assert written == frames.astype('uint16').tobytes()
        cmd = commands[0]
        assert cmd[0] == '/fake/ffmpeg'
        assert cmd[cmd.index('-s') + 1] == f'{W}x{H}'
        assert cmd[cmd.index('-vcodec') + 1] == 'ffv1'
        assert cmd[-1] == 'out.avi'

    def test_incremental_pipe_reuse(self, with_fake_ffmpeg, monkeypatch):
        '''close_pipe=False returns the pipe for streaming chunked writes;
        a second call must reuse it without spawning a new process.'''
        spawned = []

        def fake_popen(command, stdin, stderr):
            pipe = FakePipe()
            spawned.append(pipe)
            return pipe

        monkeypatch.setattr(V.subprocess, 'Popen', fake_popen)
        a = np.zeros((2, H, W), 'uint16')
        b = np.ones((2, H, W), 'uint16')
        pipe = V.write_frames('out.avi', a, close_pipe=False)
        pipe2 = V.write_frames('out.avi', b, close_pipe=False, pipe=pipe,
                               frame_size=f'{W}x{H}')
        assert pipe2 is pipe and len(spawned) == 1
        assert not pipe.closed
        pipe.stdin.seek(0)
        data = pipe.stdin.read()
        assert data == a.tobytes() + b.tobytes()


class TestReadFrames:
    def _install(self, monkeypatch, nframes=8):
        '''Fake ffprobe + ffmpeg decode: frame i is filled with value i.'''
        runs = []
        probe_stdout = os.linesep.join(
            ['ffv1', str(W), str(H), 'gray16le', f'{FPS}/1', str(nframes)]).encode()

        def handler(command):
            runs.append(command)
            if command[0] == '/fake/ffprobe':
                return FakeCompleted(stdout=probe_stdout)
            # decode call: reconstruct requested range from -ss / -vframes
            ss = command[command.index('-ss') + 1]
            h, m, s = ss.split(':')
            start = round((int(h) * 3600 + int(m) * 60 + float(s)) * FPS)
            count = int(command[command.index('-vframes') + 1])
            data = np.stack([np.full((H, W), start + i, 'uint16')
                             for i in range(count)])
            return FakeCompleted(stdout=data.tobytes())

        monkeypatch.setattr(V.subprocess, 'run', fake_only(handler))
        return runs

    def test_reads_all_frames_by_default(self, with_fake_ffmpeg, monkeypatch):
        self._install(monkeypatch, nframes=5)
        out = V.read_frames('movie.avi', fps=FPS)
        assert out.shape == (5, H, W) and out.dtype == np.uint16
        np.testing.assert_array_equal(out[:, 0, 0], np.arange(5))

    def test_coalesces_consecutive_ranges(self, with_fake_ffmpeg, monkeypatch):
        '''Request [0,1,2,6] -> exactly two decode invocations (one run of 3,
        one of 1), scattered to the right output rows.'''
        runs = self._install(monkeypatch)
        out = V.read_frames('movie.avi', frames=[0, 1, 2, 6], fps=FPS)
        decode_calls = [c for c in runs if c[0] == '/fake/ffmpeg']
        assert len(decode_calls) == 2
        np.testing.assert_array_equal(out[:, 0, 0], [0, 1, 2, 6])

    def test_decode_failure_raises(self, with_fake_ffmpeg, monkeypatch):
        probe_stdout = os.linesep.join(
            ['ffv1', str(W), str(H), 'gray16le', f'{FPS}/1', '3']).encode()

        def handler(command):
            if command[0] == '/fake/ffprobe':
                return FakeCompleted(stdout=probe_stdout)
            return FakeCompleted(stderr=b'corrupt stream', returncode=1)

        monkeypatch.setattr(V.subprocess, 'run', fake_only(handler))
        with pytest.raises(RuntimeError, match='corrupt stream'):
            V.read_frames('movie.avi', fps=FPS)


class TestPreviewWriterPipe:
    def test_h264_pipe_receives_rgb_bytes(self, with_fake_ffmpeg, monkeypatch):
        pipes, commands = [], []

        def fake_popen(command, stdin, stderr):
            commands.append(command)
            pipe = FakePipe()
            pipes.append(pipe)
            return pipe

        monkeypatch.setattr(V.subprocess, 'Popen', fake_popen)
        writer = V.PreviewVideoWriter('preview.mp4', fps=FPS)
        frames = np.random.default_rng(0).integers(
            0, 255, (2, H, W, 3), dtype=np.uint8)
        writer.write_frames(None, frames)
        writer.close()
        (pipe,) = pipes          # one process for the whole stream
        assert pipe.closed and pipe.waited
        assert len(pipe.stdin.getvalue()) == 2 * H * W * 3
        cmd = commands[0]
        assert cmd[cmd.index('-vcodec') + 1] == 'h264'
        assert cmd[cmd.index('-s') + 1] == f'{W}x{H}'
        assert cmd[-1] == 'preview.mp4'

    def test_odd_dims_padded_even(self, with_fake_ffmpeg, monkeypatch):
        '''h264 yuv420p requires even dims; odd inputs are zero-padded.'''
        pipes = []

        def fake_popen(command, stdin, stderr):
            pipe = FakePipe()
            pipes.append(pipe)
            pipe.command = command
            return pipe

        monkeypatch.setattr(V.subprocess, 'Popen', fake_popen)
        writer = V.PreviewVideoWriter('preview.mp4', fps=FPS)
        writer.write_frames(None, np.zeros((1, 5, 7, 3), np.uint8))
        writer.close()
        assert pipes[0].command[pipes[0].command.index('-s') + 1] == '8x6'
        assert len(pipes[0].stdin.getvalue()) == 6 * 8 * 3
