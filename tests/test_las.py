"""LAS/LAZ ingestion: round-trip fixtures and the OpenGF preprocess path.

The reference reads OpenGF scenes with laspy
(`/root/reference/process_open_gf.py:13-56`); `scream_tpu.data.las` parses
uncompressed .las first-party (laspy stays an optional extra for .laz).
"""

import numpy as np
import pytest

from scream_tpu.data import las


def _scene(rng, n=4000, extent=220.0):
    xyz = np.zeros((n, 3))
    xyz[:, :2] = rng.random((n, 2)) * extent
    ground = rng.random(n) < 0.5
    xyz[:, 2] = np.where(ground, 0.0, 5.0) + rng.random(n)
    cls = np.where(ground, 2, 1).astype(np.uint8)
    # A few never-classified points that ingestion must drop.
    cls[: n // 20] = 0
    return xyz, cls


class TestLasRoundTrip:
    def test_write_read(self, tmp_path):
        rng = np.random.default_rng(0)
        xyz, cls = _scene(rng, n=500)
        p = tmp_path / "t.las"
        las.write_las(str(p), xyz, cls)
        got_xyz, got_cls = las.read_las(str(p))
        # Quantized at the 1mm scale.
        np.testing.assert_allclose(got_xyz, xyz, atol=6e-4)
        np.testing.assert_array_equal(got_cls, cls)

    def test_read_rejects_non_las(self, tmp_path):
        p = tmp_path / "bad.las"
        p.write_bytes(b"NOPE" + b"\0" * 400)
        with pytest.raises(ValueError, match="LASF"):
            las.read_las(str(p))

    def test_laz_without_laspy_errors_clearly(self, tmp_path):
        """A compressed-format byte must raise the actionable ImportError
        (laspy is not installed in this image)."""
        rng = np.random.default_rng(1)
        xyz, cls = _scene(rng, n=10)
        p = tmp_path / "t.laz"
        las.write_las(str(p), xyz, cls)
        raw = bytearray(p.read_bytes())
        raw[104] |= 0x80  # LASzip compression bit
        p.write_bytes(bytes(raw))
        with pytest.raises(ImportError, match="laspy"):
            las.read_las(str(p))

    def test_opengf_cloud_drops_class_zero(self, tmp_path):
        rng = np.random.default_rng(2)
        xyz, cls = _scene(rng, n=400)
        p = tmp_path / "s.las"
        las.write_las(str(p), xyz, cls)
        pts, kept = las.read_opengf_cloud(str(p))
        assert (kept != 0).all()
        assert len(pts) == int((cls != 0).sum())


class TestMalformedInput:
    """Corrupt/truncated files must fail with a diagnostic ValueError —
    never a struct.error, IndexError, or silent garbage coordinates."""

    def _valid(self, tmp_path):
        rng = np.random.default_rng(1)
        xyz, cls = _scene(rng, n=64)
        p = tmp_path / "v.las"
        las.write_las(str(p), xyz, cls)
        return p.read_bytes()

    def test_truncation_sweep(self, tmp_path):
        blob = self._valid(tmp_path)
        p = tmp_path / "cut.las"
        # Every prefix length across the header and into the point data
        # either parses completely or raises ValueError.
        for cut in [4, 26, 96, 110, 200, 226, 227, 300, len(blob) - 37,
                    len(blob) - 1]:
            p.write_bytes(blob[:cut])
            with pytest.raises(ValueError):
                las.read_las(str(p))
        p.write_bytes(blob)
        xyz, _ = las.read_las(str(p))
        assert xyz.shape == (64, 3)

    def test_corrupt_record_length(self, tmp_path):
        blob = bytearray(self._valid(tmp_path))
        import struct

        struct.pack_into("<H", blob, 105, 4)  # record too small for xyz
        p = tmp_path / "rl.las"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="record length"):
            las.read_las(str(p))

    def test_corrupt_format_byte(self, tmp_path):
        blob = bytearray(self._valid(tmp_path))
        blob[104] = 0x2A  # format 42: no such point record format
        p = tmp_path / "fmt.las"
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="unsupported point record format"):
            las.read_las(str(p))

    def test_random_garbage_with_signature(self, tmp_path):
        rng = np.random.default_rng(3)
        for i in range(8):
            blob = b"LASF" + rng.integers(0, 256, 371, dtype=np.uint8).tobytes()
            p = tmp_path / f"g{i}.las"
            p.write_bytes(blob)
            try:
                xyz, cls = las.read_las(str(p))
            except (ValueError, ImportError):
                continue  # diagnostic error (ImportError = compression bit
                # set by the random format byte -> routed to the laspy extra)
            # If a random blob happens to be header-consistent and parses,
            # the result must still honor the parser's contract — finite
            # float coordinates with matching class labels, never silent
            # garbage shapes (the failure mode the class docstring names).
            assert xyz.ndim == 2 and xyz.shape[1] == 3
            assert cls.shape == (xyz.shape[0],)
            assert np.isfinite(xyz).all()


class TestOpenGFPreprocessFromLas:
    def test_cli_preprocess_opengf(self, tmp_path, capsys):
        """End-to-end: synthetic .las scene -> preprocess CLI -> loadable
        OpenGF artifacts."""
        from scream_tpu.cli import main
        from scream_tpu.data.datasets import OpenGFDataset

        rng = np.random.default_rng(3)
        root = tmp_path / "raw"
        (root / "test").mkdir(parents=True)
        xyz, cls = _scene(rng, n=6000, extent=220.0)
        las.write_las(str(root / "test" / "scene.las"), xyz, cls)

        out = tmp_path / "data"
        main(["preprocess", "opengf", "--root", str(root), "--out", str(out)])
        printed = capsys.readouterr().out
        assert "OpenGF_test" in printed

        ds = OpenGFDataset(str(out), "test", with_centers=True)
        assert len(ds) >= 1
        item = ds[0]
        assert item["dsm"].shape[1] == 3
        assert item["dem"].shape[1] == 3
        # Full 3-D bbox center incl. elevation
        # (`/root/reference/process_open_gf.py:237-242`).
        assert item["center"].shape == (3,)
        # Patches are centered: coordinates straddle zero even when the raw
        # scene sits at absolute elevation.
        assert abs(float(item["dem"][:, 2].mean())) < 1.0
        # DSM heights dominate DEM heights (buildings over ground).
        assert item["dsm"][:, 2].mean() >= item["dem"][:, 2].mean() - 1e-3
