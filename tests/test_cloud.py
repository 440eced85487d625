"""Archive transfer (hw_cloud_helper parity — SURVEY §2.3).

Reference behaviour: after training, the workspace is uploaded to the
object store (``zeus/common/util/hw_cloud_helper.py:51-66``); the client
is import-gated, so a machine without one degrades with a clear error
rather than a hard dependency.
"""

import os

import pytest

from xingtian_tpu.runtime.cloud import register_scheme, sync_in, sync_out

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _tree(root):
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            with open(p, "rb") as f:
                out[os.path.relpath(p, root)] = f.read()
    return out


class TestLocalTransport:
    def test_file_url_roundtrip(self, tmp_path):
        src = tmp_path / "ws"
        (src / "benchmark").mkdir(parents=True)
        (src / "benchmark" / "records.csv").write_text("a,b\n1,2\n")
        (src / "models").mkdir()
        (src / "models" / "m_000.npz").write_bytes(b"\x01\x02")

        remote = tmp_path / "bucket"
        sync_out(str(src), f"file://{remote}")
        assert _tree(str(remote)) == _tree(str(src))

        back = tmp_path / "restored"
        sync_in(f"file://{remote}", str(back))
        assert _tree(str(back)) == _tree(str(src))

    def test_bare_path_and_single_file(self, tmp_path):
        f = tmp_path / "one.txt"
        f.write_text("x")
        dest = tmp_path / "out"
        sync_out(str(f), str(dest))
        assert (dest / "one.txt").read_text() == "x"

    def test_unknown_scheme_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no archive transport"):
            sync_out(str(tmp_path), "ftp://somewhere/x")

    def test_s3_without_boto3_raises_clearly(self, tmp_path):
        pytest.importorskip("pytest")  # always true; keep symmetry
        try:
            import boto3  # noqa: F401
            pytest.skip("boto3 installed; gating path not reachable")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="boto3"):
            sync_out(str(tmp_path), "s3://bucket/prefix")

    def test_register_scheme_plugin(self, tmp_path):
        calls = []
        register_scheme("memx", lambda l, u: calls.append(("out", l, u)),
                        lambda u, l: calls.append(("in", u, l)))
        sync_out("/a", "memx://b")
        sync_in("memx://b", "/a")
        assert [c[0] for c in calls] == ["out", "in"]


class TestCliS3Flag:
    def test_save_to_s3_syncs_archive(self, tmp_path, capsys):
        """-s3 file://... uploads the finished workspace (moxing-flow
        parity with a local transport)."""
        from xingtian_tpu.main import main
        archive = tmp_path / "archive"
        bucket = tmp_path / "bucket"
        rc = main(["-f", os.path.join(EXAMPLES, "cartpole_ppo.yaml"),
                   "-t", "train", "--max_updates", "2",
                   "--archive_root", str(archive),
                   "-s3", f"file://{bucket}"])
        assert rc == 0
        assert "archive synced" in capsys.readouterr().out
        runs = os.listdir(bucket)
        assert len(runs) == 1
        synced = _tree(os.path.join(bucket, runs[0]))
        local = _tree(os.path.join(archive, os.listdir(archive)[0]))
        assert synced == local
        assert "benchmark/train_config.yaml" in {
            p.replace(os.sep, "/") for p in synced}


class TestKeySanitization:
    def test_escaping_key_rejected(self, tmp_path):
        from xingtian_tpu.runtime.cloud import _safe_dest
        import pytest
        with pytest.raises(ValueError, match="escapes"):
            _safe_dest(str(tmp_path / "dest"), "../../etc/passwd")

    def test_normal_key_resolves_inside(self, tmp_path):
        from xingtian_tpu.runtime.cloud import _safe_dest
        import os
        d = _safe_dest(str(tmp_path), "runs/exp1/records.csv")
        assert d.startswith(os.path.realpath(str(tmp_path)))
