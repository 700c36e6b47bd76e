"""Device-resident client query engine: s . A on the MXU.

The client's dominant costs are (a) expanding the 32-byte seed into the
(1774, m) public LWE matrix A (~8.4 GB at the 2^20 headline config) and
(b) the per-query ternary matvec s . A. The reference does both on a
many-core CPU (reference: chalametpir_client/src/client.rs:39-57,
client.rs:106 + matrix.rs:541-558, 1031-1059); this host has one weak
core, and a TPU sitting right there.

TPU design:

* A is stored as four biased int8 byte planes, planes[j] = ((A >> 8j)
  & 255) - 128 — same 4 B/element footprint as uint32, but each plane is
  a native MXU operand.
* In "ctr" PRG mode the planes are *generated on device* (Pallas Keccak,
  ops/prg_jax.py) — client setup never ships A over the host link. ctr
  A is fingerprint-major (core/prg.py), so the planes are laid out
  (4, m, k) and generated in contiguous fingerprint-range slabs. In
  "stream" mode (reference-interop) A is squeezed by the host XOF
  row-major and uploaded once as (4, k, m) planes.
* A query computes all four plane dots as one batched einsum over the
  k = 1774 contraction and recombines mod 2^32 with the bias correction
  128 * sum(s) per plane:
      s . A = sum_j (s . plane_j + 128 * sum(s)) << 8j   (mod 2^32)
  Exactness: each dot is int8 x int8 -> int32 with k <= 1774 terms, so
  |partial| <= 1774 * 128 * 128 < 2^25 — no int32 overflow before the
  mod-2^32 wrap (which is the arithmetic we want).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..params import LWE_DIMENSION


def _jax():
    try:
        import jax
    except Exception as e:  # pragma: no cover - host-only deploy
        from ..errors import AcceleratorError

        raise AcceleratorError(f"device client requested but jax unavailable: {e}")
    return jax


def _recode_planes_jnp(slab_u32):
    """(r, c) uint32 -> (4, r, c) int8 biased byte planes, on device."""
    import jax.numpy as jnp

    planes = []
    for j in range(4):
        p = (slab_u32 >> np.uint32(8 * j)) & np.uint32(255)
        planes.append((p.astype(jnp.int32) - 128).astype(jnp.int8))
    return jnp.stack(planes)


class DeviceQueryEngine:
    """Holds the A byte planes in HBM and runs s . A per query.

    layout "mk": planes (4, m_pad, k) — ctr mode, fingerprint-major.
    layout "km": planes (4, k_pad, m) — stream mode, row-major upload.
    """

    def __init__(self, planes, k: int, m: int, layout: str, k_pad: int | None = None):
        self._planes = planes
        self.k = k
        self.m = m
        self.layout = layout
        self.k_pad = k_pad or (planes.shape[1] if layout == "km" else k)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_seed_ctr(
        cls, seed: bytes, m: int, cols_per_step: int = 32768
    ) -> "DeviceQueryEngine":
        """Generate A's planes entirely on device (ctr PRG mode,
        fingerprint-major): each step generates a contiguous ctr slab of
        `cols_per_step` fingerprint columns and recodes it to byte planes
        in place."""
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        jax = _jax()
        import jax.numpy as jnp

        from . import prg_jax

        k = LWE_DIMENSION
        n_steps = -(-m // cols_per_step)
        m_pad = n_steps * cols_per_step

        # seed_words is an argument, not a closure capture — a captured
        # array is baked into the program, making every new seed a fresh
        # (remote, slow) compile
        @partial(jax.jit, static_argnames=("ncols", "lwe_rows"))
        def gen(sw, blk0_words, offset, ncols, lwe_rows):
            return _recode_planes_jnp(
                prg_jax.rows_from_blocks(sw, blk0_words, offset, ncols, lwe_rows)
            )

        @partial(jax.jit, donate_argnums=0)
        def write(buf, slab_planes, c0):
            return jax.lax.dynamic_update_slice(buf, slab_planes, (0, c0, jnp.int32(0)))

        seed_words = prg_jax.seed_to_words(seed)
        buf = jnp.zeros((4, m_pad, k), jnp.int8)
        for c0 in range(0, m, cols_per_step):
            blk0_words, offset = prg_jax.fp_block_start(c0, k)
            slab = gen(seed_words, blk0_words, offset, cols_per_step, k)
            buf = write(buf, slab, jnp.int32(c0))
        # columns m..m_pad hold PRG output that must not contribute — they
        # are OUTPUT positions here, so callers slice [:m]; no masking
        # needed on the contraction.
        return cls(buf, k, m, "mk")

    @classmethod
    def streaming_from_seed_ctr(
        cls, seed: bytes, m: int, cols_per_step: int = 65536
    ) -> "StreamingQueryEngine":
        """ctr-mode engine that never materialises A: each matvec batch
        regenerates A in fingerprint slabs and folds the dots chunk by
        chunk — O(cols_per_step) HBM at ANY m. Above ~2^21 entries the
        resident planes (4 * m * 1774 B) no longer fit one chip's HBM;
        this engine trades per-batch Keccak regeneration for that
        residency, so the offline prepare path stays on the MXU at
        2^23-class scale."""
        return StreamingQueryEngine(seed, m, cols_per_step)

    @classmethod
    def from_host_matrix(cls, a_host: np.ndarray) -> "DeviceQueryEngine":
        """Upload a host-expanded A (stream PRG mode / interop)."""
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        jax = _jax()

        k, m = a_host.shape
        planes_host = np.empty((4, k, m), np.int8)
        for j in range(4):
            p = (a_host >> np.uint32(8 * j)).astype(np.uint8)
            planes_host[j] = (p.astype(np.int16) - 128).astype(np.int8)
        return cls(jax.device_put(planes_host), k, m, "km")

    # -- query ---------------------------------------------------------------

    def matvec(self, codes: np.ndarray) -> np.ndarray:
        """(k,) int8 ternary codes {0:0, 1:+1, 2:-1} -> (m,) uint32 s . A."""
        if codes.shape != (self.k,):
            from ..errors import InvalidDimensionForVector

            raise InvalidDimensionForVector()
        return self.matvec_batch(codes[None, :])[0]

    def matvec_batch(self, codes: np.ndarray) -> np.ndarray:
        """(Q, k) ternary codes -> (Q, m) uint32; all Q secrets ride one
        batched einsum (the A planes stream from HBM once per batch). In
        the "mk" layout the device result carries m_pad output columns of
        PRG padding — sliced off here."""
        return np.asarray(self.matvec_batch_async(codes))[:, : self.m].astype(
            np.uint32
        )

    def matvec_batch_async(self, codes: np.ndarray):
        """Dispatch the batched matvec and return the device array without
        waiting — callers overlap host work (error sampling, the s . M
        unblinding matvec) with the device dot and the d2h readback."""
        jax = _jax()

        if codes.ndim != 2 or codes.shape[1] != self.k:
            from ..errors import InvalidDimensionForVector

            raise InvalidDimensionForVector()
        q = codes.shape[0]
        signs = np.zeros((q, self.k_pad), np.int8)
        signs[:, : self.k] = np.where(codes == 2, -1, codes).astype(np.int8)
        if self.layout == "mk":
            return _ternary_planes_matvec_mk(jax.device_put(signs), self._planes)
        return _ternary_planes_matvec_km(jax.device_put(signs), self._planes)


class StreamingQueryEngine:
    """Drop-in for DeviceQueryEngine when A's planes exceed HBM: s . A is
    computed against on-the-fly ctr slabs of A (fingerprint-major), one
    `cols_per_step` chunk per device call. Same matvec_batch* surface."""

    def __init__(self, seed: bytes, m: int, cols_per_step: int = 65536):
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        from . import prg_jax

        self.k = LWE_DIMENSION
        self.k_pad = self.k
        self.m = m
        self.layout = "streaming"
        self._seed_words = prg_jax.seed_to_words(seed)
        self._step = cols_per_step

    def matvec(self, codes: np.ndarray) -> np.ndarray:
        if codes.shape != (self.k,):
            from ..errors import InvalidDimensionForVector

            raise InvalidDimensionForVector()
        return self.matvec_batch(codes[None, :])[0]

    def matvec_batch(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(self.matvec_batch_async(codes))[:, : self.m].astype(
            np.uint32
        )

    def matvec_batch_async(self, codes: np.ndarray):
        """Dispatches all chunk folds; returns the (Q, m_pad) device array
        without draining, like DeviceQueryEngine.matvec_batch_async."""
        jax = _jax()
        import jax.numpy as jnp

        from . import prg_jax

        if codes.ndim != 2 or codes.shape[1] != self.k:
            from ..errors import InvalidDimensionForVector

            raise InvalidDimensionForVector()
        q = codes.shape[0]
        signs_dev = jax.device_put(np.where(codes == 2, -1, codes).astype(np.int8))
        n_steps = -(-self.m // self._step)
        out = jnp.zeros((q, n_steps * self._step), jnp.uint32)
        for c0 in range(0, self.m, self._step):
            blk0_words, offset = prg_jax.fp_block_start(c0, self.k)
            out = _streaming_fold(
                out, self._seed_words, blk0_words, offset, signs_dev,
                jnp.int32(c0), ncols=self._step, lwe_rows=self.k,
            )
        return out


_streaming_fold_jit = {}


def _streaming_fold(out, sw, blk0_words, offset, signs, c0, *, ncols, lwe_rows):
    """out[:, c0:c0+ncols] = s . A[:, c0:c0+ncols] over a freshly
    generated ctr slab (donated accumulator; the slab is a jit temp)."""
    jax = _jax()

    fn = _streaming_fold_jit.get("fold")
    if fn is None:
        import jax.numpy as jnp

        from . import prg_jax

        @partial(jax.jit, donate_argnums=0, static_argnames=("ncols", "lwe_rows"))
        def fold(out, sw, blk0_words, offset, signs, c0, ncols, lwe_rows):
            planes = _recode_planes_jnp(
                prg_jax.rows_from_blocks(sw, blk0_words, offset, ncols, lwe_rows)
            )  # (4, ncols, k)
            qn, k = signs.shape
            s_mat = jnp.broadcast_to(signs[None, :, :], (4, qn, k))
            dots = jnp.einsum(
                "bqk,bnk->bqn", s_mat, planes, preferred_element_type=jnp.int32
            )
            part = _combine_plane_dots(dots, signs)  # (q, ncols) uint32
            return jax.lax.dynamic_update_slice(out, part, (jnp.int32(0), c0))

        fn = _streaming_fold_jit["fold"] = fold
    return fn(out, sw, blk0_words, offset, signs, c0, ncols, lwe_rows)


def _combine_plane_dots(dots, signs):
    """(4, Q, m) int32 plane dots + (Q, k) signs -> (Q, m) uint32."""
    import jax.numpy as jnp

    s_sum = jnp.sum(signs.astype(jnp.int32), axis=1)  # (Q,)
    acc = jnp.zeros(dots.shape[1:], jnp.uint32)
    for j in range(4):
        term = (dots[j] + 128 * s_sum[:, None]).astype(jnp.uint32)
        acc = acc + (term << np.uint32(8 * j))
    return acc


def _matvec_km_impl(signs, planes):
    import jax.numpy as jnp

    q, k = signs.shape
    s_mat = jnp.broadcast_to(signs[None, :, :], (4, q, k))
    dots = jnp.einsum(
        "bqk,bkm->bqm", s_mat, planes, preferred_element_type=jnp.int32
    )
    return _combine_plane_dots(dots, signs)


def _matvec_mk_impl(signs, planes):
    import jax.numpy as jnp

    q, k = signs.shape
    s_mat = jnp.broadcast_to(signs[None, :, :], (4, q, k))
    # planes are (4, m, k): contraction over the minor dim of both — the
    # MXU takes transposed operands natively
    dots = jnp.einsum(
        "bqk,bmk->bqm", s_mat, planes, preferred_element_type=jnp.int32
    )
    return _combine_plane_dots(dots, signs)


_jitted = {}


def _jit_of(name, impl):
    fn = _jitted.get(name)
    if fn is None:
        # jit lazily so importing this module never initialises a device
        fn = _jitted[name] = _jax().jit(impl)
    return fn


def _ternary_planes_matvec_km(signs, planes):
    return _jit_of("km", _matvec_km_impl)(signs, planes)


def _ternary_planes_matvec_mk(signs, planes):
    return _jit_of("mk", _matvec_mk_impl)(signs, planes)
