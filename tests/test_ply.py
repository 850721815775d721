"""First-party PLY reader: round-trips, foreign property layouts, and the
extension-dispatch loader behind the register CLI file arguments."""

import numpy as np
import pytest

from scream_tpu.data.ply import load_cloud_any, read_ply, write_ply


@pytest.fixture
def xyz():
    return np.random.default_rng(0).uniform(-5, 5, (137, 3)).astype(np.float32)


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, xyz, binary):
        p = str(tmp_path / "c.ply")
        write_ply(p, xyz, binary=binary)
        got = read_ply(p)
        np.testing.assert_allclose(got, xyz, atol=1e-5)
        assert got.dtype == np.float32

    def test_extra_properties_skipped(self, tmp_path, xyz):
        """Scan tools add normals/colors/intensity; x/y/z are picked by
        name at the right strides."""
        n = len(xyz)
        rng = np.random.default_rng(1)
        dt = np.dtype([("nx", "<f4"), ("x", "<f4"), ("red", "u1"),
                       ("y", "<f4"), ("intensity", "<u2"), ("z", "<f8")])
        rec = np.zeros(n, dt)
        rec["x"], rec["y"] = xyz[:, 0], xyz[:, 1]
        rec["z"] = xyz[:, 2].astype(np.float64)
        rec["red"] = rng.integers(0, 255, n)
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float nx\nproperty float x\nproperty uchar red\n"
            "property float y\nproperty ushort intensity\n"
            "property double z\nend_header\n"
        )
        p = tmp_path / "props.ply"
        p.write_bytes(header.encode() + rec.tobytes())
        np.testing.assert_allclose(read_ply(str(p)), xyz, atol=1e-5)

    def test_big_endian(self, tmp_path, xyz):
        n = len(xyz)
        rec = np.zeros(n, np.dtype([("x", ">f4"), ("y", ">f4"), ("z", ">f4")]))
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        header = (
            "ply\nformat binary_big_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        p = tmp_path / "be.ply"
        p.write_bytes(header.encode() + rec.tobytes())
        np.testing.assert_allclose(read_ply(str(p)), xyz, atol=1e-5)

    def test_trailing_face_element_ignored(self, tmp_path, xyz):
        """Mesh PLYs carry a face element after the vertices — the reader
        stops at the vertex block."""
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(xyz)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
        body = np.ascontiguousarray(xyz, "<f4").tobytes() + b"\x03\x00\x00\x00\x00\x01\x00\x00\x00\x02\x00\x00\x00"
        q = tmp_path / "mesh2.ply"
        q.write_bytes(header.encode() + body)
        np.testing.assert_allclose(read_ply(str(q)), xyz, atol=1e-5)

    def test_element_before_vertex_skipped(self, tmp_path, xyz):
        """Spec-legal PLY may declare elements BEFORE vertex (camera etc.);
        their data blocks must be skipped, not read as vertices."""
        n = len(xyz)
        cam = np.arange(5, dtype="<f4").tobytes()
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element camera 1\n"
            "property float cx\nproperty float cy\nproperty float cz\n"
            "property float fx\nproperty float fy\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        p = tmp_path / "cam.ply"
        p.write_bytes(header.encode() + cam
                      + np.ascontiguousarray(xyz, "<f4").tobytes())
        np.testing.assert_allclose(read_ply(str(p)), xyz, atol=1e-5)

        # ascii variant
        header_a = header.replace("binary_little_endian", "ascii")
        body = "0 0 0 0 0\n" + "\n".join(
            " ".join(f"{v:.9g}" for v in row) for row in xyz) + "\n"
        q = tmp_path / "cam_ascii.ply"
        q.write_bytes(header_a.encode() + body.encode())
        np.testing.assert_allclose(read_ply(str(q)), xyz, atol=1e-4)

    def test_rejections(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_bytes(b"not a ply\n")
        with pytest.raises(ValueError, match="not a PLY"):
            read_ply(str(p))
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 4\nproperty float x\n"
                  b"property float y\nproperty float z\nend_header\n")
        p.write_bytes(header + b"\x00" * 10)
        with pytest.raises(ValueError, match="truncated"):
            read_ply(str(p))
        p.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 1\n"
                      b"property list uchar int x\nend_header\n")
        with pytest.raises(ValueError, match="list property"):
            read_ply(str(p))

    def test_load_cloud_any_dispatch(self, tmp_path, xyz):
        from scream_tpu.data.las import write_las

        np.save(tmp_path / "c.npy", xyz)
        write_ply(str(tmp_path / "c.ply"), xyz)
        write_las(str(tmp_path / "c.las"), xyz.astype(np.float64),
                  np.zeros(len(xyz), np.uint8))
        for name, atol in (("c.npy", 0), ("c.ply", 1e-5), ("c.las", 6e-4)):
            got = load_cloud_any(str(tmp_path / name))
            assert got.dtype == np.float32
            np.testing.assert_allclose(got, xyz, atol=atol)


class TestRegisterCLIPly:
    def test_register_ply_clouds(self, capsys, tmp_path):
        """`register --src a.ply --tgt b.ply` — the CLI accepts PLY scans
        directly (reference users come from Open3D's PLY world)."""
        import json

        from scream_tpu.cli import main

        rng = np.random.default_rng(3)
        s = rng.uniform(-1, 1, (120, 3)).astype(np.float32)
        write_ply(str(tmp_path / "a.ply"), s)
        write_ply(str(tmp_path / "b.ply"), s + np.float32([0.02, 0, 0]))
        main(["register", "--src", str(tmp_path / "a.ply"),
              "--tgt", str(tmp_path / "b.ply"),
              "--d-model", "32", "--self-layers", "1", "--cross-layers", "1",
              "--dtype", "float32"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert np.isfinite(out["transform"]).all()
