"""CLI surface + extract stage + orchestrator.

Covers the reference's tool surfaces (SURVEY.md SS2.1 #5, #7, SS3):
argparse contracts, exit codes, segment-window math, and the end-to-end
run_pipeline artifact flow on a synthetic clip pair.
"""

import json

import numpy as np
import pytest

from tests.conftest import make_test_video
from tests.test_depth_stage import make_sbs_video
from video3d_tpu.cli import align as cli_align
from video3d_tpu.cli import depth as cli_depth
from video3d_tpu.cli import extract_aligned as cli_extract
from video3d_tpu.cli import run_pipeline as cli_pipeline
from video3d_tpu.cli import upscale as cli_upscale
from video3d_tpu.core import write_wav
from video3d_tpu.stages.extract import AlignedExtractor


def _make_wav_pair(tmp_path, offset_s=0.37, sr=8000, dur=4.0):
    rng = np.random.default_rng(0)
    n = int(dur * sr)
    base = rng.normal(size=n + int(offset_s * sr)).astype(np.float32)
    # video2's audio lags video1 by offset_s
    a1 = base[int(offset_s * sr) :]
    a2 = base[: n]
    write_wav(tmp_path / "v1.wav", a1 * 0.5, sr)
    write_wav(tmp_path / "v2.wav", a2 * 0.5, sr)
    return tmp_path / "v1.wav", tmp_path / "v2.wav"


def test_align_cli_on_wavs(tmp_path):
    v1, v2 = _make_wav_pair(tmp_path)
    rc = cli_align.main(
        [str(v1), str(v2), "--work-dir", str(tmp_path / "wa"), "--no-plot"]
    )
    assert rc == 0
    data = json.loads((tmp_path / "wa" / "alignment_data.json").read_text())
    assert abs(abs(data["time_offset_seconds"]) - 0.37) < 0.01
    assert data["correlation_strength"] > 0.8


def test_depth_and_upscale_cli(tmp_path):
    sbs = tmp_path / "sbs.mp4"
    make_sbs_video(sbs, n_frames=4, shift=5)
    rc = cli_depth.main(
        [str(sbs), "--stereo-only", "--max-frames", "4", "--no-unsqueeze",
         "--no-speckle", "--batch-size", "2",
         "--work-dir", str(tmp_path / "wd")]
    )
    assert rc == 0
    caches = list((tmp_path / "wd").glob("depth_*/"))
    assert len(caches) == 1
    assert len(list(caches[0].glob("depth_*.png"))) == 4

    video_4k = tmp_path / "movie4k.mp4"
    make_test_video(video_4k, n_frames=4, width=256, height=128)
    rc = cli_upscale.main(
        [str(caches[0]), str(video_4k), "--work-dir", str(tmp_path / "wu"),
         "--method", "scale", "--batch-size", "2"]
    )
    assert rc == 0
    assert any((tmp_path / "wu").glob("depth_4k_*.mp4"))


def test_extract_stage_window_math(tmp_path):
    v1 = tmp_path / "a.mp4"
    v2 = tmp_path / "b.mp4"
    make_test_video(v1, n_frames=48, fps=24.0)
    make_test_video(v2, n_frames=48, fps=24.0)
    alignment = {
        "video1_path": str(v1),
        "video2_path": str(v2),
        "time_offset_seconds": 0.5,
        "offset_frames": 12.0,
        "correlation_strength": 0.9,
        "frame_duration": 1 / 24.0,
        "video1_fps": 24.0,
        "video2_fps": 24.0,
        "sample_rate": 22050,
        "audio_length_analyzed": 300.0,
    }
    f = tmp_path / "alignment_data.json"
    f.write_text(json.dumps(alignment))

    ex = AlignedExtractor(str(f))
    times = ex.calculate_extraction_times(start_frame=12, duration_seconds=0.5)
    assert times["video1"]["start"] == pytest.approx(0.5)
    assert times["video2"]["start"] == pytest.approx(1.0)

    # negative start clamps to 0 (extract_aligned.py:66-76)
    ex.offset = -2.0
    times = ex.calculate_extraction_times(0, 1.0)
    assert times["video2"]["start"] == 0.0
    ex.offset = 0.5

    ok, problems = ex.validate_extraction_request(12, 0.5)
    assert ok, problems
    ok, problems = ex.validate_extraction_request(47, 10.0)
    assert not ok and problems

    # actual cut (OpenCV fallback path)
    out = ex.extract_segment(0, 0.5, output_dir=str(tmp_path / "seg"))
    from video3d_tpu.core import get_video_info

    assert get_video_info(str(out["video1"]))["frames"] == 12


def test_extract_cli_info_and_validate(tmp_path):
    v1 = tmp_path / "a.mp4"
    v2 = tmp_path / "b.mp4"
    make_test_video(v1, n_frames=24)
    make_test_video(v2, n_frames=24)
    f = tmp_path / "alignment_data.json"
    f.write_text(
        json.dumps(
            {
                "video1_path": str(v1),
                "video2_path": str(v2),
                "time_offset_seconds": 0.0,
                "correlation_strength": 0.95,
                "frame_duration": 1 / 24.0,
            }
        )
    )
    assert cli_extract.main([str(f), "--info"]) == 0
    assert cli_extract.main([str(f), "--validate", "--duration", "0.5"]) == 0
    assert cli_extract.main([str(f), "--validate", "--duration", "99"]) == 1


def test_run_pipeline_cli_end_to_end(tmp_path):
    """Full align->depth->upscale on a synthetic pair (skip alignment:
    mp4 audio needs ffmpeg, absent here -- covered by the wav test)."""
    sbs = tmp_path / "sbs.mp4"
    make_sbs_video(sbs, n_frames=4, shift=5)
    video_4k = tmp_path / "movie4k.mp4"
    make_test_video(video_4k, n_frames=4, width=512, height=128)

    rc = cli_pipeline.main(
        [str(sbs), str(video_4k), "--work-dir", str(tmp_path / "wp"),
         "--skip-alignment", "--max-frames", "4", "--batch-size", "2",
         "--upscale-method", "guided"]
    )
    assert rc == 0
    outs = list((tmp_path / "wp").glob("depth_4k_*.mp4"))
    assert len(outs) == 1
    from video3d_tpu.core import get_video_info

    info = get_video_info(str(outs[0]))
    assert (info["width"], info["height"]) == (512, 128)
