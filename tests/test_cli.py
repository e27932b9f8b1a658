import json
import os

import numpy as np

from metalpathtracer_tpu import cli
from metalpathtracer_tpu.io import read_png

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORNELL = os.path.join(REPO, "scenes", "cornell.xml")


def test_cli_renders_png(tmp_path, capsys):
    out = str(tmp_path / "out.png")
    rc = cli.main(
        [
            "--scene", CORNELL,
            "--width", "32", "--height", "24",
            "--spp", "2", "--max-depth", "6",
            "--camera-pos", "0,2.5,9", "--camera-target", "0,2.5,0",
            "--fov", "40", "--output", out, "--stats-json",
        ]
    )
    assert rc == 0
    img = read_png(out)
    assert img.shape == (24, 32, 3)
    assert img.max() > 0  # not all black
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["spp"] == 2 and stats["rays"] > 0


def test_cli_checkpoint_resume(tmp_path):
    out = str(tmp_path / "o.png")
    ck = str(tmp_path / "ck.npz")
    args = [
        "--scene", CORNELL, "--width", "16", "--height", "16",
        "--max-depth", "4", "--camera-pos", "0,2.5,9",
        "--camera-target", "0,2.5,0", "--output", out,
        "--checkpoint", ck, "--checkpoint-every", "2",
    ]
    assert cli.main(args + ["--spp", "2"]) == 0
    # resume to 4 spp
    assert cli.main(args + ["--spp", "4", "--resume"]) == 0
    from metalpathtracer_tpu.io import load_checkpoint

    st, seed, _ = load_checkpoint(ck)
    assert int(st.spp) == 4

    # must equal an uninterrupted 4-spp render
    out2 = str(tmp_path / "o2.png")
    assert cli.main(
        [
            "--scene", CORNELL, "--width", "16", "--height", "16",
            "--max-depth", "4", "--camera-pos", "0,2.5,9",
            "--camera-target", "0,2.5,0", "--output", out2, "--spp", "4",
        ]
    ) == 0
    np.testing.assert_array_equal(read_png(out), read_png(out2))


def test_cli_tile_shard(tmp_path):
    out = str(tmp_path / "s.png")
    rc = cli.main(
        [
            "--scene", CORNELL, "--width", "16", "--height", "16",
            "--spp", "2", "--max-depth", "4",
            "--camera-pos", "0,2.5,9", "--camera-target", "0,2.5,0",
            "--output", out, "--tile-shard",
        ]
    )
    assert rc == 0
    assert read_png(out).shape == (16, 16, 3)
