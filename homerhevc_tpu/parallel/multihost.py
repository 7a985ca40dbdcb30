"""Multi-host frame/GOP pipeline orchestration over jax.distributed.

TPU-native role of the reference's cross-engine chain: HomerHEVC runs up
to 8 frame-parallel engine threads daisy-chained by input/output-order
semaphores, handing reconstructed-reference progress and rate-control
state from engine to engine (hmr_encoder_lib.c:1470-1487, :3268-3279).
Across TPU *hosts* the equivalent is: initialize the JAX distributed
runtime, assign frame spans to processes round-robin, and move the
reconstructed reference planes between processes at every span boundary
(cross-host collectives over DCN — no NCCL/MPI analog needed).

Within a host, chips keep the ('gop','band') mesh of parallel/sharded.py;
this module adds the process dimension above it. Streams are asserted
byte-identical to a single-process encode (tests/test_multihost.py, a
2-process CPU simulation per SURVEY.md §4's multi-node test strategy).
"""

from __future__ import annotations

import numpy as np


def init(process_id: int, num_processes: int,
         coordinator: str = "127.0.0.1:12355") -> None:
    """Initialize the JAX distributed runtime (no-op if single process)."""
    if num_processes <= 1:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def _bcast_from(arrs, src_process: int):
    """Broadcast numpy arrays from src_process to every process.

    psum formulation: a global (n_devices, ...) array where only the
    source process's first local shard is nonzero; summing axis 0 yields
    the source's value on all hosts. This rides the same cross-host
    transport a reference-plane all_gather would use on a pod (DCN), with
    a deterministic collective schedule on every process.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("p",))
    sh = NamedSharding(mesh, P("p"))
    nloc = jax.local_device_count()
    is_src = jax.process_index() == src_process
    out = []
    for a in arrs:
        a = np.asarray(a)
        wide = a.astype(np.int32)
        local = np.stack([wide if (is_src and i == 0) else
                          np.zeros_like(wide) for i in range(nloc)])
        garr = jax.make_array_from_process_local_data(sh, local)
        total = jax.jit(lambda x: jnp.sum(x, axis=0))(garr)
        out.append(np.asarray(total).astype(a.dtype))
    return out


class GopPipeline:
    """Round-robin frame-span pipeline across processes.

    Process p encodes spans s with s % num_processes == p; open-GOP spans
    (no IDR at the boundary) receive the previous span's reconstructed
    reference planes from their owner and continue the P chain via
    HomerEncoder.seed_reference. Every process returns the full, stitched
    AU list.
    """

    def __init__(self, cfg, *, span: int = 8, backend: str = "jax"):
        import jax
        self.cfg = cfg
        self.span = span
        self.backend = backend
        self.pid = jax.process_index()
        self.nproc = jax.process_count()

    def _ref_shapes(self):
        c = self.cfg
        ph, pw = c.padded_height, c.padded_width
        return [(ph, pw), (ph // 2, pw // 2), (ph // 2, pw // 2)]

    def encode(self, frames) -> list:
        from ..api import HomerEncoder

        n = len(frames)
        spans = [(s, min(n, s + self.span)) for s in range(0, n, self.span)]
        aus_by_frame: dict[int, bytes] = {}
        ref = None
        last_idr = 0
        for si, (a, b) in enumerate(spans):
            owner = si % self.nproc
            if si > 0:
                prev_owner = (si - 1) % self.nproc
                send = ref if (self.pid == prev_owner and ref is not None) \
                    else [np.zeros(s, np.uint8) for s in self._ref_shapes()]
                # the IDR anchor travels with the planes so slice POC and
                # intra-period cadence match the single-process stream
                send = send + [np.array([last_idr], np.int32)]
                *ref, anchor = _bcast_from(send, prev_owner)
                last_idr = int(anchor[0])
            if self.pid == owner:
                enc = HomerEncoder(self.cfg, backend=self.backend,
                                   fetch_recon=False)
                if si > 0:
                    enc.seed_reference(ref, poc=a, last_idr=last_idr)
                for k in range(a, b):
                    y, u, v = frames[k]
                    aus_by_frame[k] = enc.encode_frame(y, u, v)
                ref = [np.asarray(p) for p in enc._ref]
                last_idr = enc.last_idr
            elif si == 0:
                ref = None
        return self._gather_aus(aus_by_frame, spans, n)

    def _gather_aus(self, aus_by_frame, spans, n):
        # One length-vector collective + one 4 KiB-bucketed payload
        # collective PER SPAN (not per frame): spans are the natural unit
        # and each _bcast_from is a cross-host barrier of DCN latency.
        out = [None] * n
        for si, (a, b) in enumerate(spans):
            owner = si % self.nproc
            if self.pid == owner:
                raws = [np.frombuffer(aus_by_frame[k], np.uint8)
                        for k in range(a, b)]
                lens = np.array([len(r) for r in raws], np.int32)
            else:
                raws = None
                lens = np.zeros(b - a, np.int32)
            (lens,) = _bcast_from([lens], owner)
            total = int(lens.sum())
            nbk = -(-max(total, 1) // 4096) * 4096
            buf = np.zeros((nbk,), np.uint8)
            if raws is not None:
                buf[:total] = np.concatenate(raws) if raws else buf[:0]
            (buf,) = _bcast_from([buf], owner)
            off = 0
            for k in range(a, b):
                ln = int(lens[k - a])
                out[k] = buf[off:off + ln].tobytes()
                off += ln
        return out
