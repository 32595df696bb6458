"""Multi-host (multi-process) path: 2 real OS processes, Gloo CPU
collectives, global 8-device mesh — the TPU-pod layout rehearsed on CPU
(SURVEY.md §2.5; VERDICT r2 ask #5).

The worker (tests/multihost_worker.py) renders the Cornell box with
pixels sharded over the GLOBAL mesh (4 local devices × 2 processes) and
process 0 writes the ``gather_film``-assembled film. The estimator keys
RNG off absolute pixel ids, so the multi-process film must match a
single-process render of the same scene exactly (up to fp reassociation
inside a shard — in practice bitwise on CPU).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_worker.py"),
                str(i), str(nproc), f"localhost:{port}", str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    dump = np.load(tmp_path / "film.npz")

    # reference: same render in THIS process (8 local virtual devices)
    from cuda_optix_pathtracing_tpu.models.megakernel import MegakernelConfig
    from cuda_optix_pathtracing_tpu.parallel.render import (
        make_mesh,
        render_sharded,
    )
    from cuda_optix_pathtracing_tpu.scene import cornell_box

    width = height = 16
    scene = cornell_box(width, height)
    cfg = MegakernelConfig(max_depth=3, remat=False)
    ref = render_sharded(scene, cfg, width, height, 4, make_mesh(1))

    np.testing.assert_allclose(dump["mean"], np.asarray(ref.mean), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(dump["m2"], np.asarray(ref.m2), rtol=2e-4, atol=2e-5)
    assert float(dump["n"]) == 4.0
