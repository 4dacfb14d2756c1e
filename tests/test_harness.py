"""Harness-layer tests: discovery, flow I/O codec, timing writers, sweep CLI
with resume."""

import json
from pathlib import Path

import numpy as np
import pytest

from papteam_opticalflow_tpu.data.discovery import FramePairGenerator, ImageCollection
from papteam_opticalflow_tpu.utils.flowio import (
    decode_flow_fixed,
    encode_flow_fixed,
    load_flow,
    save_flow,
)
from papteam_opticalflow_tpu.utils.timing import UniversalTimingWriter

REF_ROOT = Path("/root/reference")


class TestDiscovery:
    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_reference_dataset_discovery(self):
        gen = FramePairGenerator(REF_ROOT)
        names = gen.collection_names()
        assert "HoChiMinhTraffic_10FPS_240" in names
        pairs = gen.pairs_from_collection("HoChiMinhTraffic_10FPS_240")
        # 102 frames -> 101 consecutive pairs (SURVEY.md §2.1 datasets row).
        assert len(pairs) == 101
        p = pairs[0]
        assert p.after.index == p.before.index + 1

    def test_pairing_skips_gaps(self, tmp_path):
        d = tmp_path / "images_New" / "coll"
        d.mkdir(parents=True)
        for i in (1, 2, 4, 5):  # gap at 3
            (d / f"frame_{i:05d}.jpg").write_bytes(b"")
        pairs = ImageCollection(d).pairs()
        names = [p.before.path.name for p in pairs]
        assert names == ["frame_00001.jpg", "frame_00004.jpg"]

    def test_increment_with_format_reference_cases(self):
        # The exact docstring cases of TestImage.py:incrementWithFormat,
        # including width-preserving overflow chopping.
        from papteam_opticalflow_tpu.data.discovery import increment_with_format

        cases = {"0": "1", "000": "001", "004": "005", "009": "010",
                 "9": "0", "99": "00", "999": "000"}
        for src, want in cases.items():
            assert increment_with_format(src) == want, src

    def test_after_digit_string_successor(self, tmp_path):
        from papteam_opticalflow_tpu.data.discovery import FrameImage

        f = FrameImage(tmp_path / "frame_00057.jpg")
        assert f.after().path.name == "frame_00058.jpg"
        # Width-preserving rollover: frame_999 guesses frame_000
        # (reference semantics — the guess then fails the existence check).
        g = FrameImage(tmp_path / "frame999.jpg")
        assert g.after().path.name == "frame000.jpg"

    def test_pairing_guards_degenerate_guesses(self, tmp_path):
        """The digit-string guess can misfire on layouts outside the
        reference's own datasets; pairs() must not emit self-pairs
        (non-contiguous digits make the replace a no-op) or rollover
        pairs like frame_9 -> frame_0."""
        d = tmp_path / "images_New" / "coll"
        d.mkdir(parents=True)
        # digits_in('cam2_frame_0005') = '20005' never occurs in the name.
        (d / "cam2_frame_0005.jpg").write_bytes(b"")
        pairs = ImageCollection(d).pairs()
        assert pairs == []

        d2 = tmp_path / "images_New" / "roll"
        d2.mkdir(parents=True)
        (d2 / "frame_9.jpg").write_bytes(b"")
        (d2 / "frame_0.jpg").write_bytes(b"")
        names = [p.as_storage_string() for p in ImageCollection(d2).pairs()]
        assert names == []  # frame_9 -> frame_0 rollover rejected


class TestFlowIO:
    def test_fixed_point_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        u = rng.normal(size=(17, 23)) * 5
        v = rng.normal(size=(17, 23)) * 5
        f = tmp_path / "flow.bin"
        save_flow(f, u, v)
        u2, v2 = load_flow(f)
        # Quantization step is 1/160 px (OpticalFlow.cpp:1091).
        assert np.abs(u - u2).max() <= 1 / 160 + 1e-12
        assert np.abs(v - v2).max() <= 1 / 160 + 1e-12

    def test_clamps_at_pm_200(self):
        q = encode_flow_fixed(np.array([[300.0]]), np.array([[-300.0]]))
        u, v = decode_flow_fixed(q)
        assert u[0, 0] == 200.0 and v[0, 0] == -200.0


class TestTimingWriter:
    def test_reference_schema(self, tmp_path):
        w = UniversalTimingWriter(tmp_path / "UniversalTiming.txt")
        w.append({"Total C++ Execution": "1.5"}, "HoChiMinhTraffic_10FPS_240", 8, 4)
        w.append({"Total C++ Execution": "2.5"}, "HoChiMinhTraffic_10FPS_240", 8, 4)
        lines = (tmp_path / "UniversalTiming.txt").read_text().splitlines()
        assert lines[1] == "Image\tTotal C++ Execution"
        assert lines[2] == "240 pixels 8 threads4 pyramid\t1.5"
        assert len(lines) == 4  # header written once


class TestSweepCLI:
    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_sweep_and_resume(self, tmp_path):
        from papteam_opticalflow_tpu.harness import testsuite

        argv = [
            "--root", str(REF_ROOT),
            "--collections", "HoChiMinhTraffic_10FPS_240",
            "--images-per-collection", "1",
            "--pyramid-levels", "2",
            "--output", str(tmp_path),
            "--no-images",
        ]
        args = testsuite.build_parser().parse_args(argv)
        stats = testsuite.run_sweep(args)
        assert stats["completed"] == 1 and stats["failed"] == 0
        assert (tmp_path / "UniversalTiming.txt").exists()
        manifest_lines = [
            json.loads(line)
            for line in (tmp_path / "sweep_manifest.jsonl")
            .read_text().splitlines() if line.strip()
        ]
        assert len(manifest_lines) == 1

        # Resume: everything already done -> skipped.
        args = testsuite.build_parser().parse_args(argv + ["--resume"])
        stats = testsuite.run_sweep(args)
        assert stats["completed"] == 0 and stats["skipped"] == 1

        # Pre-r3 whole-set manifest format still resumes.
        (tmp_path / "sweep_manifest.jsonl").unlink()
        (tmp_path / "sweep_manifest.json").write_text(
            json.dumps({"completed": manifest_lines})
        )
        stats = testsuite.run_sweep(args)
        assert stats["completed"] == 0 and stats["skipped"] == 1

    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_pipelined_sweep(self, tmp_path):
        """--pipeline overlaps pair k+1's dispatch with pair k's barrier;
        results (statuses, artifact set, manifest) must match the
        sequential sweep, with timing rows tagged 'pipelined'."""
        from papteam_opticalflow_tpu.harness import testsuite

        argv = [
            "--root", str(REF_ROOT),
            "--collections", "HoChiMinhTraffic_10FPS_240",
            "--images-per-collection", "3",
            "--pyramid-levels", "2",
            "--output", str(tmp_path),
            "--pipeline",
        ]
        stats = testsuite.run_sweep(testsuite.build_parser().parse_args(argv))
        assert stats["completed"] == 3 and stats["failed"] == 0
        rows = [
            json.loads(line)
            for line in (tmp_path / "timing.jsonl").read_text().splitlines()
        ]
        assert len(rows) == 3
        assert all(r["status"] == "ok" for r in rows)
        assert all(r["timing_mode"] == "pipelined" for r in rows)
        assert all(r["max_flow"] > 0 for r in rows)
        imgs = list((tmp_path / "HoChiMinhTraffic_10FPS_240_tpu"
                     / "images_P2").glob("*.jpg"))
        assert len(imgs) == 3  # viz artifacts drain through the pipeline

    def test_gif_assembly(self, tmp_path):
        """--gif writes the per-collection animated-flow artifact (the
        reference's images_Video/*/normal_out.gif deliverable)."""
        from PIL import Image

        from papteam_opticalflow_tpu.harness import testsuite

        argv = [
            "--root", str(REF_ROOT),
            "--collections", "HoChiMinhTraffic_10FPS_240",
            "--images-per-collection", "3",
            "--pyramid-levels", "2",
            "--gif", "--no-images",
            "--output", str(tmp_path),
        ]
        stats = testsuite.run_sweep(testsuite.build_parser().parse_args(argv))
        assert stats["completed"] == 3
        gif = tmp_path / "HoChiMinhTraffic_10FPS_240_tpu" / "flow_P2.gif"
        with Image.open(gif) as im:
            assert im.is_animated and im.n_frames == 3

    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_mesh_sweep(self, tmp_path):
        """--mesh-frame/--mesh-ty drive the sweep over a (2, 2) device mesh
        through batched_coarse2fine_flow (VERDICT r1 item 5: the harness
        can now exercise the reference's numCores analogue as mesh shape).
        Results must match the single-device sweep's flow images."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        from papteam_opticalflow_tpu.harness import testsuite

        base = [
            "--root", str(REF_ROOT),
            "--collections", "HoChiMinhTraffic_10FPS_240",
            "--images-per-collection", "2",
            "--pyramid-levels", "2",
            "--batch-progression", "2",
            "--no-images",
        ]
        argv = base + [
            "--mesh-frame", "2", "--mesh-ty", "2",
            "--output", str(tmp_path / "mesh"),
        ]
        stats = testsuite.run_sweep(testsuite.build_parser().parse_args(argv))
        assert stats["completed"] == 2 and stats["failed"] == 0
        rows = [
            json.loads(line)
            for line in (tmp_path / "mesh" / "timing.jsonl").read_text().splitlines()
        ]
        assert all(r["status"] == "ok" for r in rows)

    def test_batch_progression_sweep(self, tmp_path):
        """--batch-progression sweeps pairs-per-dispatch (the TPU analogue
        of the reference threadProgression, ``TestSuite.py:93``); batched
        work items are keyed separately and per-pair timings recorded."""
        from papteam_opticalflow_tpu.harness import testsuite

        argv = [
            "--root", str(REF_ROOT),
            "--collections", "HoChiMinhTraffic_10FPS_240",
            "--images-per-collection", "3",
            "--pyramid-levels", "2",
            "--batch-progression", "1", "2",
            "--output", str(tmp_path),
            "--no-images",
        ]
        args = testsuite.build_parser().parse_args(argv)
        stats = testsuite.run_sweep(args)
        # 3 pairs at b=1 plus 3 pairs at b=2 (a full group of 2 + remainder).
        assert stats["completed"] == 6 and stats["failed"] == 0
        records = [
            json.loads(line)
            for line in (tmp_path / "timing.jsonl").read_text().splitlines()
        ]
        by_batch = {}
        for r in records:
            by_batch.setdefault(r["batch"], []).append(r)
        assert len(by_batch[1]) == 3 and len(by_batch[2]) == 3
        assert all(r["seconds"] > 0 for r in records)


class TestNativeLoader:
    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_native_decode_matches_pil(self):
        from papteam_opticalflow_tpu.data.native_loader import (
            decode_chw, native_available,
        )
        if not native_available():
            pytest.skip("native loader not built (native/build.sh)")
        from PIL import Image

        gen = FramePairGenerator(REF_ROOT)
        p = gen.pairs_from_collection("HoChiMinhTraffic_10FPS_240")[0].before.path
        a = decode_chw(p)
        pil = np.moveaxis(np.asarray(Image.open(p)).astype(np.float32) / 255.0, -1, 0)
        assert a.shape == pil.shape
        np.testing.assert_allclose(a, pil, atol=1e-6)

    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_prefetch_pipeline_order_and_content(self):
        from papteam_opticalflow_tpu.data.native_loader import (
            PrefetchingPairLoader, decode_chw, native_available,
        )
        if not native_available():
            pytest.skip("native loader not built")
        gen = FramePairGenerator(REF_ROOT)
        pairs = gen.pairs_from_collection("HoChiMinhTraffic_10FPS_240")[:6]
        pp = [(p.before.path, p.after.path) for p in pairs]
        with PrefetchingPairLoader(n_threads=2, depth=3, copy=True) as loader:
            out = list(loader.iter_pairs(pp))
        assert len(out) == 6
        for (pa, pb), (a, b) in zip(pp, out):
            np.testing.assert_allclose(a, decode_chw(pa), atol=1e-6)
            np.testing.assert_allclose(b, decode_chw(pb), atol=1e-6)

    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_ring_views_live_for_depth_minus_one(self):
        # Yielded arrays are ring VIEWS valid for depth-1 further
        # iterations; a consumer that holds a whole batch group before
        # stacking (the harness batch path) must size depth >= group+1.
        # With depth=7 all 6 collected views must still hold their own
        # pair's bytes at the end (with a smaller ring, early views would
        # be clobbered by later decodes).
        from papteam_opticalflow_tpu.data.native_loader import (
            PrefetchingPairLoader, decode_chw, native_available,
        )
        if not native_available():
            pytest.skip("native loader not built")
        gen = FramePairGenerator(REF_ROOT)
        pairs = gen.pairs_from_collection("HoChiMinhTraffic_10FPS_240")[:6]
        pp = [(p.before.path, p.after.path) for p in pairs]
        with PrefetchingPairLoader(
            n_threads=2, depth=7, dtype=np.uint8
        ) as loader:
            held = list(loader.iter_pairs(pp))  # hold all views
            for (pa, pb), (a, b) in zip(pp, held):
                np.testing.assert_array_equal(
                    a, decode_chw(pa, dtype=np.uint8)
                )
                np.testing.assert_array_equal(
                    b, decode_chw(pb, dtype=np.uint8)
                )

    @pytest.mark.skipif(not REF_ROOT.exists(), reason="dataset not mounted")
    def test_u8_decode_is_raw_bytes(self):
        # The serving path decodes straight to uint8 (device-side /255):
        # the bytes must be EXACTLY the decoder's output — i.e. u8/255
        # reproduces the f32 loader bit-for-bit (u8 values are exact in
        # f32, and the harness normalize divides by a traced 255).
        from papteam_opticalflow_tpu.data.native_loader import (
            PrefetchingPairLoader, decode_chw, native_available,
        )

        gen = FramePairGenerator(REF_ROOT)
        pairs = gen.pairs_from_collection("HoChiMinhTraffic_10FPS_240")[:3]
        pp = [(p.before.path, p.after.path) for p in pairs]
        p0 = pp[0][0]
        u8 = decode_chw(p0, dtype=np.uint8)
        assert u8.dtype == np.uint8
        from PIL import Image

        pil = np.moveaxis(np.asarray(Image.open(p0)), -1, 0)
        np.testing.assert_array_equal(u8, pil)
        if not native_available():
            pytest.skip("native loader not built")
        with PrefetchingPairLoader(
            n_threads=2, depth=3, copy=True, dtype=np.uint8
        ) as loader:
            out = list(loader.iter_pairs(pp))
        assert len(out) == 3
        for (pa, pb), (a, b) in zip(pp, out):
            assert a.dtype == np.uint8 and b.dtype == np.uint8
            np.testing.assert_array_equal(a, decode_chw(pa, dtype=np.uint8))
            np.testing.assert_array_equal(b, decode_chw(pb, dtype=np.uint8))

    def test_native_decode_error(self, tmp_path):
        from papteam_opticalflow_tpu.data.native_loader import (
            decode_chw, native_available,
        )
        if not native_available():
            pytest.skip("native loader not built")
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"not a jpeg")
        with pytest.raises(IOError):
            decode_chw(bad)


class TestU8DeviceFrames:
    def test_u8_normalize_matches_f32_path(self):
        # The sweep ships uint8 frames and normalizes on device (x/255);
        # for loader outputs (which ARE u8/255 in f32) the u8 roundtrip
        # and the device division must reproduce the f32 inputs exactly,
        # so the flow is bit-identical to feeding f32 directly.
        import numpy as np
        import jax.numpy as jnp

        from papteam_opticalflow_tpu.harness import testsuite
        from papteam_opticalflow_tpu.models.coarse2fine import (
            coarse2fine_flow_chw,
        )
        from papteam_opticalflow_tpu.utils.params import FlowParams

        rng = np.random.default_rng(0)
        u8a = rng.integers(0, 256, (3, 48, 64), dtype=np.uint8)
        u8b = rng.integers(0, 256, (3, 48, 64), dtype=np.uint8)
        # Exactly what the loaders emit: an f32 array divided by 255 in
        # f32 (PIL path: np.asarray(img, f32)/255.0; native loader:
        # (float)px / 255.0f) — NOT a f64 divide rounded to f32, which
        # differs by 1 ulp on some values.
        fa = u8a.astype(np.float32) / 255.0
        fb = u8b.astype(np.float32) / 255.0

        cache = {}
        da = testsuite._frame_to_device_u8(fa, "a", cache)
        db = testsuite._frame_to_device_u8(fb, "b", cache)
        np.testing.assert_array_equal(np.asarray(da), u8a)  # exact inverse
        assert testsuite._frame_to_device_u8(fa, "a", cache) is da  # cached

        params = FlowParams()
        u1, v1, _ = testsuite._flow_u8_jit(2, params)(da, db)
        u0, v0, _ = coarse2fine_flow_chw(
            jnp.asarray(fa), jnp.asarray(fb), 2, params
        )
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u0))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
