"""Host-side media ingest: video frames and audio waveforms.

Reference behavior:

- video: OpenCV capture, ``int()``-truncated fps and frame count
  (/root/reference/src/data/get_face_images.py:20-24)
- audio: ffmpeg mp4 -> 44.1 kHz stereo wav, torchaudio load, channel-mean
  mixdown, resample to 16 kHz (/root/reference/src/data/utils.py:42-60);
  the ffmpeg step is skipped when the wav already exists (:44-45)

This environment has no ffmpeg/torchaudio: wav files are read with the
stdlib ``wave`` module and resampled with ``avcer_tpu.ops.audio.resample``;
when the input is a container (mp4/avi) we shell out to ffmpeg if present,
otherwise raise a clear error. The decode loop yields fixed-size frame
batches so the device pipeline sees static shapes.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import wave
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from avcer_tpu.ops.audio import mixdown_mono, resample


@dataclass
class VideoMeta:
    path: str
    width: int
    height: int
    fps: int  # int-truncated like the reference
    total_frames: int


class VideoReader:
    """Sequential BGR frame reader with fixed-size batching."""

    def __init__(self, path: str):
        import cv2

        self._cv2 = cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        self.meta = VideoMeta(
            path=path,
            width=int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=int(self.cap.get(cv2.CAP_PROP_FPS)),
            total_frames=int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ret, frame = self.cap.read()
            if not ret:
                return
            yield frame

    def batches(self, batch_size: int) -> Iterator[tuple[np.ndarray, int]]:
        """Yield ([batch_size, H, W, 3] uint8 BGR, n_valid). The final batch
        is padded by repeating the last frame (static shapes for jit)."""
        buf: list[np.ndarray] = []
        for frame in self:
            buf.append(frame)
            if len(buf) == batch_size:
                yield np.stack(buf), batch_size
                buf = []
        if buf:
            n = len(buf)
            while len(buf) < batch_size:
                buf.append(buf[-1])
            yield np.stack(buf), n

    def release(self) -> None:
        self.cap.release()


def prefetch_iter(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue — overlaps
    host video decode (cv2 releases the GIL) with device dispatch on this
    single-core host."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def producer() -> None:
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """PCM wav -> (float32 [channels, samples] in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    return data.reshape(-1, ch).T, sr


def write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    """float32 mono/stereo [-1,1] -> 16-bit PCM wav (test/bench fixture IO)."""
    wav = np.asarray(wav)
    if wav.ndim == 1:
        wav = wav[None]
    pcm = np.clip(wav.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(wav.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def extract_audio(
    path_video: str, sample_rate: int = 16_000, cache: bool = True
) -> np.ndarray:
    """Video/wav path -> mono float32 waveform at ``sample_rate``.

    Mirrors convert_mp4_to_mp3 (data/utils.py:42-60): wav sidecar cache,
    channel-mean mixdown, sinc resample.
    """
    if path_video.lower().endswith(".wav"):
        wav_path = path_video
    else:
        wav_path = path_video[:-3] + "wav" if "." in path_video[-5:] else path_video + ".wav"
        if not os.path.exists(wav_path):
            ffmpeg = shutil.which("ffmpeg")
            if ffmpeg is None:
                raise RuntimeError(
                    f"no wav sidecar at {wav_path} and ffmpeg is unavailable; "
                    "provide audio as a .wav next to the video"
                )
            subprocess.run(
                [ffmpeg, "-y", "-i", path_video, "-vn", "-acodec", "pcm_s16le",
                 "-ar", "44100", "-ac", "2", wav_path],
                check=True, capture_output=True,
            )
    data, sr = read_wav(wav_path)
    mono = mixdown_mono(data)
    if sr != sample_rate:
        mono = resample(mono, sr, sample_rate)
    return np.asarray(mono, dtype=np.float32)


def resize_nearest_np(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Host-side PIL-NEAREST resize by integer gather, bit-exact vs PIL
    (shares ops.image.nearest_indices_np; used for face crops before device
    upload)."""
    from avcer_tpu.ops.image import nearest_indices_np

    h, w = img.shape[:2]
    ri = nearest_indices_np(out_hw[0], h)
    ci = nearest_indices_np(out_hw[1], w)
    return img[ri[:, None], ci[None, :]]
