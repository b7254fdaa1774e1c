"""`reef_tpu.cli serve`: long-lived JSON-lines proving worker."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e


def test_serve_roundtrip(tmp_path):
    doc = tmp_path / "s.txt"
    doc.write_text("aaaaaaaab")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    p = subprocess.Popen(
        [sys.executable, "-m", "reef_tpu.cli", "serve"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        env=env, cwd=tmp_path)
    try:
        def rpc(argv):
            p.stdin.write(json.dumps({"argv": argv}) + "\n")
            p.stdin.flush()
            return json.loads(p.stdout.readline())

        assert json.loads(p.stdout.readline()).get("ready")
        r = rpc(["ascii", "--e2e", "-d", str(doc), "-r", ".*b"])
        assert r["ok"] and "Verification PASSED" in r["output"]
        # warm re-verify through the same process (cached circuit stack)
        r = rpc(["ascii", "--verify", "-d", str(doc), "-r", ".*b"])
        assert r["ok"]
        # malformed request must answer an error, not kill the worker
        r = rpc(["ascii", "--verify", "-d", str(doc), "-r", "NOSUCH(("])
        assert not r["ok"] and r.get("error")
        r = rpc(["ascii", "--verify", "-d", str(doc), "-r", ".*b"])
        assert r["ok"]
    finally:
        p.stdin.close()
        p.wait(timeout=60)
