"""Audio extraction and WAV I/O for the alignment stage.

The reference extracts mono 22,050 Hz pcm_s16le audio with ffmpeg and loads
it with librosa (reference: utils.py:41-119, utils.py:122-134). Here:

* WAV decode/encode is stdlib ``wave`` + numpy (no librosa/soundfile),
  returning float32 in [-1, 1] like ``librosa.load``;
* container audio extraction uses an ffmpeg subprocess when available,
  with the reference's cache (md5 key + mtime freshness, utils.py:61-70)
  and its alternate-argument-order retry (utils.py:92-109);
* when ffmpeg is absent, ``.wav`` inputs are decoded directly (resampled
  on-host if needed) so the alignment stage stays fully functional.
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from pathlib import Path
from typing import Tuple

import numpy as np

from video3d_tpu.core.cache import audio_cache_path

DEFAULT_SAMPLE_RATE = 22050  # reference utils.py:42
DEFAULT_EXTRACT_DURATION = 600.0  # reference utils.py:42


def read_wav(path: str | Path) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 mono waveform in [-1,1], sample_rate)."""
    with wave.open(str(path), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sr = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {sampwidth} bytes")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, sr


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    """Write a float waveform in [-1,1] as mono 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def resample_linear(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Cheap host-side linear resampler for WAV fallback inputs."""
    if sr_in == sr_out:
        return audio
    n_out = int(round(len(audio) * sr_out / sr_in))
    x_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(x_out, np.arange(len(audio), dtype=np.float64), audio).astype(
        np.float32
    )


def _ffmpeg_extract(
    ffmpeg: str, video_path: str, out_path: Path, duration: float, sample_rate: int
) -> None:
    base = [ffmpeg, "-y", "-v", "error"]
    # Primary argument order, then the reference's fallback reordering
    # (utils.py:92-109): some containers need -ss after -i.
    attempts = [
        base + ["-ss", "0", "-t", str(duration), "-i", str(video_path)],
        base + ["-i", str(video_path), "-ss", "0", "-t", str(duration)],
    ]
    tail = [
        "-vn",
        "-acodec", "pcm_s16le",
        "-ar", str(sample_rate),
        "-ac", "1",
        str(out_path),
    ]
    last_err = None
    for head in attempts:
        try:
            subprocess.run(head + tail, check=True, capture_output=True)
            return
        except subprocess.CalledProcessError as e:  # try alternate arg order
            last_err = e
    stderr = last_err.stderr.decode(errors="replace") if last_err else ""
    raise RuntimeError(f"ffmpeg audio extraction failed for {video_path}: {stderr}")


def extract_audio(
    video_path: str,
    work_dir: str | Path,
    duration: float = DEFAULT_EXTRACT_DURATION,
    sample_rate: int = DEFAULT_SAMPLE_RATE,
) -> Path:
    """Extract (cached) mono audio from a video -> path to WAV in work_dir.

    Cache key and mtime-freshness semantics follow the reference
    (utils.py:61-70): the cached WAV is reused only if it is newer than the
    source video. A sanity check rejects implausibly small outputs
    (utils.py:115-116).
    """
    video = Path(video_path)
    work = Path(work_dir)
    work.mkdir(parents=True, exist_ok=True)
    out_path = audio_cache_path(work, video_path, duration, sample_rate)

    if out_path.exists() and out_path.stat().st_mtime > video.stat().st_mtime:
        print(f"Using cached audio: {out_path.name}")
        return out_path

    from video3d_tpu.core import _native

    ffmpeg = shutil.which("ffmpeg")
    if _native.av_lib() is not None and video.suffix.lower() != ".wav":
        # in-process libav decode: any codec (AAC-LC, AC3, MP3, PCM...)
        # straight to mono s16 at the target rate -- no subprocess, no
        # ffmpeg binary needed (closes SURVEY N6 on bare hosts)
        print(f"Extracting audio from {video.name} (libav)...")
        nerr = _native.av_audio_to_wav(
            str(video), str(out_path), sample_rate, duration
        )
        if nerr is not None:
            if ffmpeg is None:
                raise RuntimeError(
                    f"libav audio extraction failed for {video_path}: {nerr}"
                )
            _ffmpeg_extract(
                ffmpeg, video_path, out_path, duration, sample_rate
            )
    elif ffmpeg is not None:
        print(f"Extracting audio from {video.name}...")
        _ffmpeg_extract(ffmpeg, video_path, out_path, duration, sample_rate)
    elif video.suffix.lower() == ".wav":
        # ffmpeg-less fallback: the "video" is already an audio file.
        audio, sr = read_wav(video)
        audio = resample_linear(audio, sr, sample_rate)
        audio = audio[: int(duration * sample_rate)]
        write_wav(out_path, audio, sample_rate)
    else:
        # ffmpeg-less container path: uncompressed PCM tracks (sowt/
        # twos/raw/lpcm/ipcm) need no decoder -- the native remuxer
        # pulls the sample bytes straight into a WAV. Compressed audio
        # (AAC et al.) still needs ffmpeg.
        from video3d_tpu.core import _native

        tmp = out_path.with_suffix(".pcm_full.wav")
        nerr = _native.extract_pcm_wav(str(video), str(tmp))
        if nerr is None:
            audio, sr = read_wav(tmp)
            tmp.unlink(missing_ok=True)
            audio = resample_linear(audio, sr, sample_rate)
            audio = audio[: int(duration * sample_rate)]
            write_wav(out_path, audio, sample_rate)
        else:
            raise RuntimeError(
                "No ffmpeg binary found and input is not a WAV file; "
                f"native PCM extraction: {nerr}; cannot extract audio "
                f"from container: {video_path}. Provide a .wav sidecar "
                "or install ffmpeg."
            )

    if out_path.stat().st_size < 1000:  # reference utils.py:115-116
        raise RuntimeError(f"Extracted audio suspiciously small: {out_path}")
    return out_path


def load_audio_for_sync(
    audio_path: str | Path, max_length_seconds: float = 300.0
) -> Tuple[np.ndarray, int]:
    """Load a WAV truncated to max_length (reference utils.py:122-134)."""
    audio, sr = read_wav(audio_path)
    max_samples = int(max_length_seconds * sr)
    if len(audio) > max_samples:
        audio = audio[:max_samples]
        print(f"Limited audio to {max_length_seconds}s for sync analysis")
    return audio, sr
