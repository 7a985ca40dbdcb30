"""Multi-host GOP pipeline: 2-process CPU simulation, byte-identical
streams (SURVEY.md §4 multi-node strategy; the reference's engine chain,
hmr_encoder_lib.c:1470-1487, has no cross-machine analog — this is the
TPU-native extension validated the same way: cross-implementation
bit-exactness)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(%(repo)r, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, %(repo)r)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]

from homerhevc_tpu.parallel import multihost
multihost.init(pid, nproc, coordinator="127.0.0.1:" + port)

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.utils.synth import synth_clip

W, H, N, SPAN = 128, 64, 8, 4
frames = list(synth_clip(W, H, N, seed=3))
cfg = EncoderConfig(width=W, height=H, qp=30, cu_size=32,
                    intra_period=%(intra_period)d,
                    sign_hiding=True, sample_adaptive_offset=True)
pipe = multihost.GopPipeline(cfg, span=SPAN)
aus = pipe.encode(frames)
with open(%(out)r + str(pid), "wb") as f:
    f.write(b"".join(aus))
print("OK", pid, sum(len(a) for a in aus))
"""


def _free_port() -> str:
    # an ephemeral port avoids collisions with concurrent runs / TIME_WAIT
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return str(port)


def _run_pipeline(tmp_path, intra_period):
    from homerhevc_tpu.api import HomerEncoder
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.utils.synth import synth_clip
    # single-process golden FIRST: fills the shared compile cache so the
    # two workers run in near-lockstep (a cold worker pair can skew past
    # the distributed runtime's shutdown-barrier timeout)
    frames = list(synth_clip(128, 64, 8, seed=3))
    cfg = EncoderConfig(width=128, height=64, qp=30, cu_size=32,
                        intra_period=intra_period, sign_hiding=True,
                        sample_adaptive_offset=True)
    enc = HomerEncoder(cfg, backend="jax", fetch_recon=False)
    golden = b"".join(enc.encode_frame(*f) for f in frames)

    out = str(tmp_path / "mh_")
    script = WORKER % dict(repo=os.path.abspath(REPO), out=out,
                           intra_period=intra_period)
    sp = str(tmp_path / "worker.py")
    with open(sp, "w") as f:
        f.write(script)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    port = _free_port()
    procs = [subprocess.Popen([sys.executable, "-u", sp, str(i), "2", port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]

    # both processes produced the complete stitched stream, equal to the
    # single-process encode
    with open(out + "0", "rb") as f:
        s0 = f.read()
    with open(out + "1", "rb") as f:
        s1 = f.read()
    assert s0 == s1 and len(s0) > 0
    assert s0 == golden


def test_two_process_pipeline_byte_identical(tmp_path):
    _run_pipeline(tmp_path, intra_period=0)


def test_two_process_pipeline_midspan_idr(tmp_path):
    # intra_period=6 with span=4: the IDR at poc 6 falls mid-span in span 1
    # — exercises the last_idr carry through seed_reference
    _run_pipeline(tmp_path, intra_period=6)
