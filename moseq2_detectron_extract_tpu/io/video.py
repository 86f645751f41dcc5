'''Video/raw-frame io: 16-bit raw ``.dat`` reader with coalesced random access,
ffmpeg-backed compressed readers/writers (gated on ffmpeg availability).

Parity targets: m2de/io/video.py (raw reader :28-127, block coalescing
:130-147, ffprobe :163-219, ffv1 writer :223-276, ffmpeg reader :279-354,
preview writer :358-436,519-555).
'''
import datetime
import logging
import os
import re
import shutil
import subprocess
import tarfile
import tempfile
from itertools import groupby
from operator import itemgetter
from typing import IO, Iterable, List, Optional, Tuple, TypeVar, TypedDict, Union

import numpy as np

FFMPEG = shutil.which('ffmpeg')
FFPROBE = shutil.which('ffprobe')


class RawVideoInfo(TypedDict):
    '''Metadata for raw uncompressed depth data.'''
    bytes: int
    nframes: int
    dims: Tuple[int, int]
    bytes_per_frame: int


T = TypeVar('T', int, float)


def collapse_consecutive_values(values: Iterable[T]) -> List[Tuple[T, int]]:
    '''Collapse sorted values into (start, run_length) tuples for coalesced reads.'''
    grouped = []
    for _, group in groupby(enumerate(values), lambda ix: ix[0] - ix[1]):
        local = list(map(itemgetter(1), group))
        grouped.append((local[0], len(local)))
    return grouped


def get_raw_info(filename: Union[str, tarfile.TarInfo], bit_depth: int = 16,
                 frame_dims: Tuple[int, int] = (512, 424)) -> RawVideoInfo:
    '''Compute frame count/shape info for a raw ``.dat`` file (or tar member).'''
    bytes_per_frame = int((frame_dims[0] * frame_dims[1] * bit_depth) / 8)
    nbytes = filename.size if isinstance(filename, tarfile.TarInfo) else os.stat(filename).st_size
    return {
        'bytes': nbytes,
        'nframes': int(nbytes / bytes_per_frame),
        'dims': frame_dims,
        'bytes_per_frame': bytes_per_frame,
    }


def read_frames_raw(filename: Union[str, tarfile.TarInfo],
                    frames: Optional[Union[int, Iterable[int]]] = None,
                    frame_dims: Tuple[int, int] = (512, 424), bit_depth: int = 16,
                    dtype='<i2', tar_object: Optional[tarfile.TarFile] = None) -> np.ndarray:
    '''Read frames from a raw 16-bit little-endian ``.dat`` file.

    Random access indices are coalesced into consecutive seek/read blocks.
    Returns array of shape (nframes, height, width).
    '''
    info = get_raw_info(filename, bit_depth=bit_depth, frame_dims=frame_dims)

    if isinstance(frames, (int, np.integer)):
        frames = [int(frames)]
    elif frames is not None:
        frames = [int(i) for i in frames]
    if not frames:
        frames = list(range(info['nframes']))

    pos = {f: i for i, f in enumerate(frames)}  # frame -> output row, O(N)
    blocks = []
    for start, nframes in collapse_consecutive_values(sorted(frames)):
        idxs = [pos[start + i] for i in range(nframes)]
        # consecutive output rows (the streaming case) assign via a cheap
        # slice view instead of a fancy-index gather copy (~0.5 s / 1000
        # full frames, as much as the read itself)
        consec = idxs == list(range(idxs[0], idxs[0] + nframes))
        blocks.append({
            'seek': max(0, start * info['bytes_per_frame']),
            'nbytes': nframes * info['bytes_per_frame'],
            'shape': (nframes, frame_dims[1], frame_dims[0]),
            'idxs': slice(idxs[0], idxs[0] + nframes) if consec else idxs,
        })

    out = np.empty((len(frames), frame_dims[1], frame_dims[0]), dtype=np.dtype(dtype))

    if tar_object is not None:
        member = tar_object.extractfile(filename)
        if member is None:
            raise FileNotFoundError(f'could not open tar member {filename}')
        with member:
            for blk in blocks:
                member.seek(blk['seek'])
                chunk = member.read(blk['nbytes'])
                out[blk['idxs'], ...] = np.frombuffer(chunk, dtype=np.dtype(dtype)).reshape(blk['shape'])
    elif isinstance(filename, (str, os.PathLike)):
        with open(filename, 'rb') as fh:
            for blk in blocks:
                fh.seek(blk['seek'])
                if isinstance(blk['idxs'], slice):
                    # stream straight into the output rows: no intermediate
                    # chunk allocation + copy (each ~0.45 s / 1000 full frames)
                    view = out[blk['idxs']]
                    got = fh.readinto(memoryview(view).cast('B'))
                    if got != blk['nbytes']:
                        raise EOFError(
                            f'short read: wanted {blk["nbytes"]} bytes, '
                            f'got {got} ({filename})')
                else:
                    chunk = np.fromfile(fh, dtype=np.dtype(dtype),
                                        count=blk['shape'][0] * frame_dims[0] * frame_dims[1])
                    out[blk['idxs'], ...] = chunk.reshape(blk['shape'])
    else:
        raise ValueError(f'cannot read frames from {filename!r} without a tar object')

    return out


class FFProbeInfo(TypedDict):
    '''Results of an ffprobe metadata query.'''
    file: str
    codec: str
    pixel_format: str
    dims: Tuple[int, int]
    fps: float
    nframes: int


_CV2_FFMPEG: Optional[bool] = None


def has_cv2_ffmpeg() -> bool:
    '''True when OpenCV was built against the FFMPEG (libav*) libraries —
    the in-process fallback used for every compressed-video path when the
    ffmpeg/ffprobe BINARIES are absent (this sandbox ships libavcodec/
    libavformat but no CLI). Verified lossless for 16-bit FFV1 in
    tests/test_video_cv2_ffv1.py.'''
    global _CV2_FFMPEG
    if _CV2_FFMPEG is None:
        try:
            import cv2
            # column alignment of the build-info table varies across OpenCV
            # builds — match the row tolerantly, not an exact-width substring
            _CV2_FFMPEG = re.search(
                r'FFMPEG:\s+YES', cv2.getBuildInformation()) is not None
        except ImportError:  # pragma: no cover
            _CV2_FFMPEG = False
    return _CV2_FFMPEG


def _require_ffmpeg():
    if FFMPEG is None or FFPROBE is None:
        raise RuntimeError('ffmpeg/ffprobe not available on this host; '
                           'compressed video paths require them. Raw .dat sessions work without.')


class _Cv2VideoPipe:
    '''cv2.VideoWriter wrapped in the minimal ``subprocess.Popen`` surface
    the chunked ffv1 writer loop drives (``pipe.stdin.close()`` +
    ``pipe.wait()`` — m2de/cli.py:195-205 semantics).'''

    def __init__(self, filename: str, fps: int, frame_size: Tuple[int, int],
                 pixel_format: str, codec: str):
        import cv2
        fourcc = cv2.VideoWriter_fourcc(*('FFV1' if codec == 'ffv1' else 'mp4v'))
        params = []
        if pixel_format == 'gray16le':
            params = [cv2.VIDEOWRITER_PROP_DEPTH, cv2.CV_16U,
                      cv2.VIDEOWRITER_PROP_IS_COLOR, 0]
        self._writer = cv2.VideoWriter(filename, cv2.CAP_FFMPEG, fourcc,
                                       float(fps), frame_size, params)
        if not self._writer.isOpened():
            raise RuntimeError(
                f'cv2 FFMPEG backend could not open {filename} for '
                f'{codec}/{pixel_format}')
        self.stdin = self  # duck-typed: pipe.stdin.close() is a no-op

    def write_frame(self, frame: np.ndarray) -> None:
        self._writer.write(frame)

    def close(self) -> None:
        '''stdin.close() analog — the writer finalizes in wait().'''

    def wait(self) -> int:
        self._writer.release()
        return 0


def _stage_tar_member(filename: tarfile.TarInfo, tar_object: tarfile.TarFile) -> str:
    tmp = tempfile.NamedTemporaryFile(delete=False, suffix=os.path.splitext(filename.name)[1])
    member = tar_object.extractfile(filename)
    if member is None:
        raise FileNotFoundError(f'could not open tar member {filename}')
    with member:
        shutil.copyfileobj(member, tmp)
    tmp.close()
    return tmp.name


def _get_video_info_cv2(filename: str) -> FFProbeInfo:
    '''Probe via cv2's FFMPEG backend (binary-free ffprobe analog).'''
    import cv2
    cap = cv2.VideoCapture(filename, cv2.CAP_FFMPEG)
    if not cap.isOpened():
        raise RuntimeError(f'cv2 FFMPEG backend could not open {filename}')
    try:
        fourcc = int(cap.get(cv2.CAP_PROP_FOURCC))
        codec = ''.join(chr((fourcc >> (8 * i)) & 0xFF) for i in range(4))
        codec = codec.strip('\x00').lower()
        dims = (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
        fps = float(cap.get(cv2.CAP_PROP_FPS))
        nframes = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        # pixel format: decode one frame without RGB conversion and inspect
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        ok, frame = cap.read()
        if ok and frame is not None and frame.dtype == np.uint16:
            pixel_format = 'gray16le'
        elif ok and frame is not None and frame.ndim == 2:
            pixel_format = 'gray'
        else:
            pixel_format = 'yuv420p'
        return {'file': filename, 'codec': 'ffv1' if codec == '1vff' else codec,
                'pixel_format': pixel_format, 'dims': dims, 'fps': fps,
                'nframes': nframes}
    finally:
        cap.release()


def get_video_info(filename: Union[str, tarfile.TarInfo],
                   tar_object: Optional[tarfile.TarFile] = None) -> FFProbeInfo:
    '''Probe a compressed video for codec/dims/fps/frame count via ffprobe
    (or cv2's in-process FFMPEG backend when the binary is absent).'''
    if FFPROBE is None and has_cv2_ffmpeg():
        staged = None
        if isinstance(filename, tarfile.TarInfo):
            assert tar_object is not None
            staged = _stage_tar_member(filename, tar_object)
        try:
            return _get_video_info_cv2(staged or filename)
        finally:
            if staged:
                os.remove(staged)
    _require_ffmpeg()
    staged = None
    if isinstance(filename, tarfile.TarInfo):
        assert tar_object is not None
        staged = _stage_tar_member(filename, tar_object)
        probe_filename = staged
    else:
        probe_filename = filename

    command = [FFPROBE, '-v', 'fatal', '-show_entries',
               'stream=width,height,r_frame_rate,nb_frames,codec_name,pix_fmt',
               '-of', 'default=noprint_wrappers=1:nokey=1', probe_filename, '-sexagesimal']
    proc = subprocess.run(command, capture_output=True, check=False)
    if staged:
        os.remove(staged)
    if proc.returncode != 0:
        raise RuntimeError(f'ffprobe failed: {proc.stderr.decode()}')
    lines = proc.stdout.decode().split(os.linesep)
    num, den = lines[4].split('/')
    return {
        'file': probe_filename,
        'codec': lines[0],
        'pixel_format': lines[3],
        'dims': (int(lines[1]), int(lines[2])),
        'fps': float(num) / float(den),
        'nframes': int(lines[5]),
    }


def write_frames(filename: str, frames: np.ndarray, threads: int = 6, fps: int = 30,
                 pixel_format: str = 'gray16le', codec: str = 'ffv1',
                 close_pipe: bool = True, pipe=None, slices: int = 24,
                 slicecrc: int = 1, frame_size: Optional[str] = None):
    '''Stream uint16 frames to a lossless ffv1 avi via an ffmpeg stdin pipe
    (or cv2's in-process libav encoder when the binary is absent — verified
    bit-exact for gray16le ffv1 in tests/test_video_cv2_ffv1.py).'''
    if FFMPEG is None and has_cv2_ffmpeg():
        if pipe is None:
            pipe = _Cv2VideoPipe(filename, fps,
                                 (frames.shape[2], frames.shape[1]),
                                 pixel_format, codec)
        for i in range(frames.shape[0]):
            pipe.write_frame(np.ascontiguousarray(
                frames[i].astype('uint16' if pixel_format == 'gray16le'
                                 else frames.dtype)))
        if close_pipe:
            pipe.wait()
            return None
        return pipe
    _require_ffmpeg()
    if frame_size is None:
        frame_size = f'{frames.shape[2]:d}x{frames.shape[1]:d}'
    command = [FFMPEG, '-y', '-loglevel', 'fatal', '-framerate', str(fps),
               '-f', 'rawvideo', '-s', frame_size, '-pix_fmt', pixel_format,
               '-i', '-', '-an', '-vcodec', codec, '-threads', str(threads),
               '-slices', str(slices), '-slicecrc', str(slicecrc), '-r', str(fps), filename]
    if pipe is None:
        pipe = subprocess.Popen(command, stdin=subprocess.PIPE, stderr=subprocess.PIPE)
    for i in range(frames.shape[0]):
        pipe.stdin.write(frames[i].astype('uint16').tobytes())
    if close_pipe:
        pipe.stdin.close()
        pipe.wait()
        return None
    return pipe


def _read_frames_cv2(filename: str, frames, pixel_format: str) -> np.ndarray:
    '''Seek-decode via cv2's FFMPEG backend: consecutive runs share one seek
    (CAP_PROP_POS_FRAMES) and decode sequentially.'''
    import cv2
    cap = cv2.VideoCapture(filename, cv2.CAP_FFMPEG)
    if not cap.isOpened():
        raise RuntimeError(f'cv2 FFMPEG backend could not open {filename}')
    try:
        if pixel_format == 'gray16le':
            cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        if frames is None or len(frames) == 0:
            frames = list(range(int(cap.get(cv2.CAP_PROP_FRAME_COUNT))))
        else:
            frames = [int(f) for f in frames]
        pos = {f: i for i, f in enumerate(frames)}
        out = None
        for start, nframes in collapse_consecutive_values(sorted(frames)):
            if int(cap.get(cv2.CAP_PROP_POS_FRAMES)) != start:
                cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            for k in range(nframes):
                ok, frame = cap.read()
                if not ok:
                    raise RuntimeError(
                        f'decode failed at frame {start + k} of {filename}')
                if pixel_format == 'rgb24' and frame.ndim == 3:
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if out is None:
                    out = np.empty((len(frames),) + frame.shape, frame.dtype)
                out[pos[start + k]] = frame
        return out
    finally:
        cap.release()


def read_frames(filename: Union[str, tarfile.TarInfo], frames=None, threads: int = 6,
                fps: int = 30, pixel_format: str = 'gray16le',
                frame_size: Optional[Tuple[int, int]] = None, slices: int = 24,
                slicecrc: int = 1, tar_object: Optional[tarfile.TarFile] = None, **_) -> np.ndarray:
    '''Decode frames from a compressed video through an ffmpeg rawvideo pipe
    (or cv2's in-process libav decoder when the binary is absent).'''
    if FFMPEG is None and has_cv2_ffmpeg():
        staged = None
        if isinstance(filename, tarfile.TarInfo):
            assert tar_object is not None
            staged = _stage_tar_member(filename, tar_object)
        try:
            return _read_frames_cv2(staged or filename, frames, pixel_format)
        finally:
            if staged:
                os.remove(staged)
    _require_ffmpeg()
    staged = None
    if isinstance(filename, tarfile.TarInfo):
        assert tar_object is not None
        staged = _stage_tar_member(filename, tar_object)
        frames_filename = staged
    else:
        frames_filename = filename

    try:
        finfo = get_video_info(frames_filename)
        if frames is None or len(frames) == 0:
            frames = list(range(finfo['nframes']))
        else:
            frames = [int(f) for f in frames]
        if not frame_size:
            frame_size = finfo['dims']

        if pixel_format == 'gray16le':
            dtype, tail_shape = 'uint16', (frame_size[1], frame_size[0])
        elif pixel_format == 'rgb24':
            dtype, tail_shape = 'uint8', (frame_size[1], frame_size[0], 3)
        else:
            raise ValueError(f'unsupported pixel format {pixel_format}')

        out = np.empty((len(frames), *tail_shape), dtype)
        for start, nframes in collapse_consecutive_values(sorted(frames)):
            command = [FFMPEG, '-loglevel', 'fatal',
                       '-ss', str(datetime.timedelta(seconds=start / fps)),
                       '-i', frames_filename, '-vframes', str(nframes),
                       '-f', 'image2pipe', '-s', f'{frame_size[0]:d}x{frame_size[1]:d}',
                       '-pix_fmt', pixel_format, '-threads', str(threads),
                       '-slices', str(slices), '-slicecrc', str(slicecrc),
                       '-vcodec', 'rawvideo', '-']
            proc = subprocess.run(command, capture_output=True, check=False)
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr.decode())
            idxs = [frames.index(start + i) for i in range(nframes)]
            out[idxs] = np.frombuffer(proc.stdout, dtype=dtype).reshape((nframes, *tail_shape))
        return out
    finally:
        if staged:
            os.remove(staged)


def load_movie_data(filename: Union[str, tarfile.TarInfo], frames=None,
                    frame_dims: Tuple[int, int] = (512, 424), bit_depth: int = 16,
                    **kwargs) -> np.ndarray:
    '''Dispatch frame loading by file extension (.dat raw vs .avi/.mp4 ffmpeg).'''
    fname = (filename.name if isinstance(filename, tarfile.TarInfo) else filename).lower()
    if isinstance(frames, (int, np.integer)):
        frames = [int(frames)]
    if fname.endswith('.dat'):
        return read_frames_raw(filename, frames=frames, frame_dims=frame_dims,
                               bit_depth=bit_depth, **kwargs)
    if fname.endswith(('.avi', '.mp4')):
        return read_frames(filename, frames, **kwargs)
    raise RuntimeError(f'unknown movie format: {fname}')


def get_movie_info(filename: Union[str, tarfile.TarInfo],
                   frame_dims: Tuple[int, int] = (512, 424), bit_depth: int = 16,
                   tar_object: Optional[tarfile.TarFile] = None):
    '''Dispatch movie metadata probing by file extension.'''
    fname = (filename.name if isinstance(filename, tarfile.TarInfo) else filename).lower()
    if fname.endswith('.dat'):
        return get_raw_info(filename, frame_dims=frame_dims, bit_depth=bit_depth)
    if fname.endswith(('.avi', '.mp4')):
        return get_video_info(filename, tar_object=tar_object)
    raise RuntimeError(f'unknown movie format: {fname}')


def _jet_lut() -> np.ndarray:
    x = np.linspace(0.0, 1.0, 256)
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype('uint8')


_JET_LUT = _jet_lut()
_JET_LUT_BGR = np.ascontiguousarray(_JET_LUT[:, ::-1])


def apply_colormap_jet(frames: np.ndarray, vmin: float = 0, vmax: float = 100,
                       out: Optional[np.ndarray] = None,
                       order: str = 'rgb') -> np.ndarray:
    '''False-color single channel frames with a jet-like colormap -> uint8
    RGB (or BGR with ``order='bgr'`` — lets the cv2 encoder path skip a
    block-wide cvtColor).

    Implemented as a 256-entry LUT gather: one integer pass over the frames
    instead of ~10 float passes (matters on weak host cores). ``out`` reuses
    a persistent ``frames.shape + (3,)`` uint8 buffer.
    '''
    if order not in ('rgb', 'bgr'):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    frames = np.asarray(frames)
    base_lut = _JET_LUT if order == 'rgb' else _JET_LUT_BGR
    scale = 255.0 / max(vmax - vmin, 1e-6)
    if frames.dtype == np.uint8:
        # fold the intensity rescale into the LUT: zero arithmetic per pixel
        vals = np.clip((np.arange(256) - vmin) * scale, 0, 255).astype('uint8')
        lut = base_lut[vals]
    else:
        frames = np.clip((frames.astype('float32') - vmin) * scale,
                         0, 255).astype('uint8')
        lut = base_lut
    if out is not None and out.shape == frames.shape + (3,):
        np.take(lut, frames, axis=0, out=out)
        return out
    return lut[frames]


class PreviewVideoWriter:
    '''Stateful preview mp4 writer.

    Uses an ffmpeg h264 pipe when ffmpeg is present (parity with
    m2de/io/video.py:519-555); otherwise falls back to cv2.VideoWriter so
    preview output still works on hosts without ffmpeg.
    '''

    def __init__(self, filename: str, fps: int = 30, vmin: float = 0,
                 vmax: float = 100, channel_order: str = 'rgb') -> None:
        self.filename = filename
        self.fps = fps
        self.vmin = vmin
        self.vmax = vmax
        # 'bgr' marks incoming uint8 color blocks as already BGR (the
        # preview step renders BGR-native), so the cv2 encoder path skips
        # its block-wide cvtColor and the ffmpeg path reads -pix_fmt bgr24
        self.channel_order = channel_order
        self._pipe = None
        self._cvwriter = None
        self._bgr_buf: Optional[np.ndarray] = None

    def _frame_to_rgb(self, frame: np.ndarray, frame_no: Optional[int]) -> np.ndarray:
        '''Convert one frame to a uint8 color frame in ``self.channel_order``
        (gray frames are colormapped in that order; uint8 color frames are
        assumed to already BE in that order).'''
        if frame.ndim == 2:
            rgb = apply_colormap_jet(frame[None], self.vmin, self.vmax,
                                     order=self.channel_order)[0]
        elif frame.dtype == np.uint8:
            rgb = np.ascontiguousarray(frame)  # no copy when already packed
        else:
            rgb = frame.astype('uint8')
        if frame_no is not None:
            try:
                import cv2
                cv2.putText(rgb, str(frame_no), (5, rgb.shape[0] - 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255), 2, cv2.LINE_AA)
            except ImportError:  # pragma: no cover
                pass
        return rgb

    def write_frames(self, frame_idxs: np.ndarray, frames: np.ndarray,
                     writable: bool = False) -> None:
        '''Append ``frames`` (gray or color) to the preview video.

        uint8 color blocks take a batched path: one block-wide BGR conversion
        into a persistent buffer (cv2 route) or one pipe write per block
        (ffmpeg route) instead of a per-frame convert+copy — fresh-page
        allocation per frame was a measured preview bottleneck.

        ``writable=True`` declares the caller's block safe to mutate in
        place (e.g. a reused render buffer): frame-number stamps then skip
        the defensive copy that channel-native blocks otherwise require.'''
        if frames.shape[1] % 2:
            frames = np.pad(frames, ((0, 0), (0, 1)) + ((0, 0),) * (frames.ndim - 2))
        if frames.shape[2] % 2:
            frames = np.pad(frames, ((0, 0), (0, 0), (0, 1)) + ((0, 0),) * (frames.ndim - 3))

        if frames.ndim == 4 and frames.dtype == np.uint8 and FFMPEG is not None:
            contig = np.ascontiguousarray(frames)
            if frame_idxs is not None:  # stamp frame numbers
                if contig is frames and not writable:
                    contig = frames.copy()
                for i in range(contig.shape[0]):
                    self._frame_to_rgb(contig[i], int(frame_idxs[i]))
            self._ffmpeg_pipe(contig.shape).stdin.write(memoryview(contig))
            return
        if frames.ndim == 4 and frames.dtype == np.uint8:
            try:
                import cv2
                return self._write_block_cv2(cv2, frame_idxs, frames,
                                             writable=writable)
            except ImportError:  # pragma: no cover - fall through per-frame
                pass

        for i in range(frames.shape[0]):
            rgb = self._frame_to_rgb(frames[i], int(frame_idxs[i]) if frame_idxs is not None else None)
            if FFMPEG is not None:
                self._ffmpeg_pipe((1,) + rgb.shape).stdin.write(rgb.tobytes())
            else:
                import cv2
                if self._cvwriter is None:
                    fourcc = cv2.VideoWriter_fourcc(*'mp4v')
                    self._cvwriter = cv2.VideoWriter(self.filename, fourcc, self.fps,
                                                     (rgb.shape[1], rgb.shape[0]))
                if self.channel_order == 'bgr':  # already encoder-native
                    self._cvwriter.write(rgb)
                else:
                    self._cvwriter.write(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))

    def _write_block_cv2(self, cv2, frame_idxs, frames,
                         writable: bool = False) -> None:
        '''Batched uint8 color block write through the cv2 encoder.

        RGB blocks take one block-wide cvtColor into a persistent BGR buffer
        (cvtColor, not frames[..., ::-1] — cv2 copies non-contiguous input
        through a slow path, 2x the whole encode measured; per-frame
        conversion paid a fresh-page allocation per frame). BGR-native
        blocks (channel_order='bgr') skip the conversion entirely and are
        stamped/encoded in place.'''
        n, h, w, _ = frames.shape
        if self.channel_order == 'bgr':
            if writable and frames.flags.c_contiguous:
                bgr = frames  # caller-owned render buffer: stamp in place
            else:
                # copy into the persistent buffer: the frame-number stamp
                # below mutates pixels, and aliasing the caller's block would
                # scribble on data the pipeline may still be reading
                bgr = self._bgr_buf
                if bgr is None or bgr.shape != frames.shape:
                    bgr = self._bgr_buf = np.empty(frames.shape, np.uint8)
                np.copyto(bgr, frames)
        else:
            bgr = self._bgr_buf
            if bgr is None or bgr.shape != frames.shape:
                bgr = self._bgr_buf = np.empty(frames.shape, np.uint8)
            cv2.cvtColor(np.ascontiguousarray(frames).reshape(n * h, w, 3),
                         cv2.COLOR_RGB2BGR, dst=bgr.reshape(n * h, w, 3))
        if self._cvwriter is None:
            fourcc = cv2.VideoWriter_fourcc(*'mp4v')
            self._cvwriter = cv2.VideoWriter(self.filename, fourcc,
                                             self.fps, (w, h))
        for i in range(n):
            if frame_idxs is not None:
                cv2.putText(bgr[i], str(int(frame_idxs[i])), (5, h - 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255),
                            2, cv2.LINE_AA)
            self._cvwriter.write(bgr[i])

    def _ffmpeg_pipe(self, block_shape) -> 'subprocess.Popen':
        if self._pipe is None:
            h, w = block_shape[1], block_shape[2]
            command = [FFMPEG, '-y', '-loglevel', 'fatal', '-threads', '2',
                       '-framerate', str(self.fps), '-f', 'rawvideo',
                       '-s', f'{w:d}x{h:d}',
                       '-pix_fmt',
                       'bgr24' if self.channel_order == 'bgr' else 'rgb24',
                       '-i', '-', '-an', '-vcodec', 'h264',
                       '-r', str(self.fps), '-pix_fmt', 'yuv420p',
                       '-tune', 'zerolatency', '-preset', 'ultrafast', self.filename]
            self._pipe = subprocess.Popen(command, stdin=subprocess.PIPE,
                                          stderr=subprocess.PIPE)
        return self._pipe

    def close(self) -> None:
        '''Finalize the video file.'''
        if self._pipe is not None:
            self._pipe.stdin.close()
            self._pipe.wait()
            self._pipe = None
        if self._cvwriter is not None:
            self._cvwriter.release()
            self._cvwriter = None
