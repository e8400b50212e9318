"""Audio/video multimodal stages: deterministic codec round-trip, real DSP
feature values, one-row-per-frame sampling, and the Ray actor-pool plumbing
(schema, batch fan-out) end-to-end over the clip fixtures."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightcrawler_ray.extras import multimodal
from lightcrawler_ray.functions import avcodec, imagecodec
from lightcrawler_ray.sources import synth


class TestAvCodec:
    def test_audio_roundtrip_exact(self):
        pcm = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 12000).astype(np.int16)
        blob = avcodec.encode_audio(pcm, 8000)
        out, sr = avcodec.decode_audio(blob)
        assert sr == 8000
        assert np.array_equal(out, pcm)

    def test_video_roundtrip_exact(self):
        frames = np.arange(5 * 4 * 6 * 3, dtype=np.uint8).reshape(5, 4, 6, 3)
        blob = avcodec.encode_video(frames, 10)
        out, fps = avcodec.decode_video(blob)
        assert fps == 10
        assert np.array_equal(out, frames)

    def test_truncated_payloads_raise(self):
        a = avcodec.synth_audio(3)
        v = avcodec.synth_video(3)
        with pytest.raises(avcodec.CodecError):
            avcodec.decode_audio(a[:-10])
        with pytest.raises(avcodec.CodecError):
            avcodec.decode_video(v[:-10])
        with pytest.raises(avcodec.CodecError):
            avcodec.decode_audio(b"????junk")

    def test_synthesis_deterministic(self):
        assert avcodec.synth_audio(7) == avcodec.synth_audio(7)
        assert avcodec.synth_video(7) == avcodec.synth_video(7)
        assert avcodec.synth_audio(7) != avcodec.synth_audio(8)


class TestAudioFeatures:
    def test_known_sine_features(self):
        # pure full-scale-ish sine: rms = amp/sqrt(2), zcr = 2f/sr, energy in
        # the band holding f
        sr, f, amp = 8000, 440.0, 16000
        t = np.arange(sr) / sr  # exactly 1 s
        pcm = (amp * np.sin(2 * np.pi * f * t)).astype(np.int16)
        stage = multimodal.AudioFeatures(n_bands=8)
        out = stage(
            pa.table(
                {
                    "clip_id": pa.array(["c0"], pa.string()),
                    "bytes": pa.array([avcodec.encode_audio(pcm, sr)], pa.binary()),
                }
            )
        )
        row = out.to_pylist()[0]
        assert row["sr"] == sr and row["decoded"]
        assert row["duration_s"] == pytest.approx(1.0)
        assert row["rms"] == pytest.approx(amp / 32768.0 / math.sqrt(2), rel=1e-3)
        assert row["zcr"] == pytest.approx(2 * f / sr, rel=2e-2)
        bands = row["spec_bands"]
        assert len(bands) == 8
        # 440 Hz lives in band 0 of [0, 4000) split into 8 → argmax band 0
        assert int(np.argmax(bands)) == 0

    def test_bad_blob_flagged_not_fatal(self):
        stage = multimodal.AudioFeatures()
        out = stage(
            pa.table(
                {
                    "clip_id": pa.array(["ok", "bad"], pa.string()),
                    "bytes": pa.array(
                        [avcodec.synth_audio(1), b"not-audio"], pa.binary()
                    ),
                }
            )
        )
        assert out.column("decoded").to_pylist() == [True, False]


class TestVideoFrameSample:
    def test_sampling_layout_and_content(self):
        every_n = 4
        vids = [avcodec.synth_video(i) for i in range(5)]
        t = pa.table(
            {
                "video_id": pa.array([f"vd-{i}" for i in range(5)], pa.string()),
                "bytes": pa.array(vids, pa.binary()),
            }
        )
        out = multimodal.VideoFrameSample(every_n=every_n)(t)
        # one row per sampled frame, exact count
        expected = sum(
            math.ceil(avcodec.decode_video(b)[0].shape[0] / every_n) for b in vids
        )
        assert out.num_rows == expected
        # frame content survives the re-encode into the IMAGES payload shape
        frames0, fps0 = avcodec.decode_video(vids[0])
        sel = out.filter(pa.compute.equal(out.column("video_id"), "vd-0"))
        for row in sel.to_pylist():
            assert row["ts_ms"] == int(row["frame_idx"] * 1000 / fps0)
            px = imagecodec.decode(row["bytes"])
            assert np.array_equal(px, frames0[row["frame_idx"]])


class TestRayPlumbing:
    def test_audio_features_dataset(self, ray_session, tmp_path):
        paths = synth.ensure_av_fixtures(root=str(tmp_path))
        n = pq.read_metadata(paths["audio"]).num_rows
        t = multimodal.audio_features(paths["audio"]).take_all()
        assert len(t) == n
        assert all(r["decoded"] for r in t)
        assert {r["sr"] for r in t} == {8000}

    def test_video_frames_dataset(self, ray_session, tmp_path):
        paths = synth.ensure_av_fixtures(root=str(tmp_path))
        src = pq.read_table(paths["video"], columns=["video_id", "bytes"])
        expected = {
            vid: math.ceil(avcodec.decode_video(b)[0].shape[0] / 4)
            for vid, b in zip(
                src.column("video_id").to_pylist(), src.column("bytes").to_pylist()
            )
        }
        rows = multimodal.video_frames(paths["video"], every_n=4).take_all()
        got: dict[str, int] = {}
        for r in rows:
            got[r["video_id"]] = got.get(r["video_id"], 0) + 1
        assert got == expected

    def test_video_scene_cuts_match_bruteforce(self, ray_session, tmp_path):
        import numpy as np

        paths = synth.ensure_av_fixtures(root=str(tmp_path))
        src = pq.read_table(paths["video"], columns=["video_id", "bytes"])
        want: dict[tuple[str, int], tuple[int, bool]] = {}
        for vid, b in zip(src.column("video_id").to_pylist(),
                          src.column("bytes").to_pylist()):
            frames, _ = avcodec.decode_video(b)
            for i in range(1, len(frames)):
                sad = int(np.abs(frames[i].astype(np.int64)
                                 - frames[i - 1].astype(np.int64)).sum())
                want[(vid, i)] = (sad, sad >= 15000)
        rows = multimodal.video_scene_cuts(paths["video"]).take_all()
        got = {(r["video_id"], r["frame_idx"]): (r["sad"], r["is_cut"])
               for r in rows}
        assert got == want
        assert any(c for _, c in got.values()) and not all(c for _, c in got.values())
