"""Drive the interactive terminal viewer through a pty (no display needed)."""

import os
import select
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not hasattr(os, "openpty"), reason="no pty support")
def test_viewer_renders_frames_and_quits():
    import pty

    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.path.insert(0, {REPO!r});"
        "from metalpathtracer_tpu.viewer import main;"
        f"main(['--scene', {os.path.join(REPO, 'scenes', 'cornell.xml')!r},"
        "'--width','32','--height','24','--max-depth','3','--max-frames','2']);"
        "print('VIEWER_DONE')"
    )
    m, s = pty.openpty()
    p = subprocess.Popen(
        [sys.executable, "-c", code], stdin=s, stdout=s, stderr=s,
        close_fds=True,
    )
    os.close(s)
    out = b""
    deadline = time.time() + 120
    while time.time() < deadline:
        if p.poll() is not None and not select.select([m], [], [], 0.2)[0]:
            break
        r, _, _ = select.select([m], [], [], 0.5)
        if r:
            try:
                out += os.read(m, 65536)
            except OSError:
                break
        if b"VIEWER_DONE" in out:
            break
    os.close(m)
    p.wait(timeout=30)
    txt = out.decode(errors="replace")
    assert "VIEWER_DONE" in txt, txt[-500:]
    assert "▀" in txt  # half-block pixels were drawn
    assert txt.count("spp |") >= 2  # progressive status line per frame
