"""The PIR server: TPU-resident encoded DB, MXU respond path.

Equivalent of the reference Server (reference:
chalametpir_server/src/server.rs:16-218), redesigned for TPU:

* the encoded DB is stored on-device as two int8 digit planes in the
  (m, C) orientation — no transpose/compress step is needed because the
  MXU streams the K dimension natively (the reference's transposed +
  bit-packed layout exists to please CPU caches);
* the hint matmul A . D runs on the MXU, with A streamed from the host
  XOF in row blocks so the full (1774, m) matrix never occupies HBM;
* respond accepts one query or a batch; batches lower to a single int8
  matmul.

A numpy backend (`backend="numpy"`) provides the same semantics without
a device, used as the cross-check oracle in tests.
"""

from __future__ import annotations

import contextlib
import gc
from functools import partial

import numpy as np

from ..core import encode_db, matrix_io, prg
from ..errors import (
    EmptyKVDatabase,
    IncompatibleDimensionForRowVectorTransposedMatrixMultiplication,
)
from ..params import (
    LWE_DIMENSION,
    MAX_CIPHER_TEXT_BIT_LEN,
    MIN_CIPHER_TEXT_BIT_LEN,
    SEED_BYTE_LEN,
    SERVER_SETUP_MAX_ATTEMPT_COUNT,
    find_mat_elem_bit_len,
)


class Server:
    """Stateful PIR server holding the device-resident encoded database."""

    def __init__(
        self,
        backend: str,
        planes,
        num_query_cols: int,
        num_response_cols: int,
        mat_elem_bit_len: int,
        layout: str = "digit2",
        mesh=None,
    ):
        self._backend = backend
        # jax/digit2: (d0, d1) int8 device arrays; jax/packed: a PallasDB;
        # numpy: the raw uint16 D matrix
        self._planes = planes
        self._layout = layout
        self._num_query_cols = num_query_cols
        self._num_response_cols = num_response_cols
        self.mat_elem_bit_len = mat_elem_bit_len
        self._mesh = mesh
        self._sharded_respond = None
        if mesh is not None:
            from ..parallel import sharded_respond_packed_fn

            self._sharded_respond = sharded_respond_packed_fn(mesh, planes)

    # -- setup ---------------------------------------------------------------

    @classmethod
    def setup(
        cls,
        seed: bytes,
        db: dict[bytes, bytes],
        arity: int = 3,
        backend: str = "auto",
        layout: str = "auto",
        prg_mode: str = "stream",
        hint_block_rows: int | None = None,
        rng: np.random.Generator | None = None,
        mesh=None,
        mat_elem_bit_len: int | None = None,
    ) -> tuple["Server", bytes, bytes]:
        """Encode `db`, compute the hint M = A . D, return
        (server, hint_bytes, filter_param_bytes)
        (reference: server.rs:47-78).

        prg_mode: "stream" derives A exactly like the reference (serial
        host XOF, wire-compatible with Rust peers); "ctr" derives A in
        independent counter blocks so it is generated *on the TPU* and
        never crosses the host link — both peers must use the same mode
        (see core/prg.py).

        mesh: a jax.sharding.Mesh with ("data", "model") axes. The encoded
        DB's fingerprint dimension is sharded over `model` (for DBs beyond
        one chip's HBM, e.g. 2^23 x 1 kB over 8 chips), query batches over
        `data`; hint partials and responses psum over ICI, exact mod 2^32.

        mat_elem_bit_len overrides the derived element width (expert /
        test knob — the reference always derives it from the DB size,
        server.rs:193-218; scaled-down sharding tests use the override to
        exercise a big-DB geometry on small data)."""
        if len(db) == 0:
            raise EmptyKVDatabase()
        if len(seed) != SEED_BYTE_LEN:
            raise ValueError(f"seed must be {SEED_BYTE_LEN} bytes")
        backend = _resolve_backend(backend)

        from ..utils import telemetry

        # a million-entry `db` dict pins millions of objects in the old GC
        # generation while tracing/compilation below allocates heavily —
        # every gen-2 collection then walks the whole dict. Suspend the
        # collector for the duration (no cycles are created that must be
        # reclaimed mid-setup; anything cyclic is collected on exit).
        if mat_elem_bit_len is not None and not (
            MIN_CIPHER_TEXT_BIT_LEN <= mat_elem_bit_len <= MAX_CIPHER_TEXT_BIT_LEN
        ):
            from ..errors import ImpossibleEncodedDBMatrixElementBitLength

            raise ImpossibleEncodedDBMatrixElementBitLength()

        with _gc_paused():
            bit_len = (
                mat_elem_bit_len
                if mat_elem_bit_len is not None
                else find_mat_elem_bit_len(len(db))
            )
            with telemetry.span("server_setup.encode_db", entries=len(db), b=bit_len):
                mat_d, filt = encode_db.from_kv_database(
                    db, arity, bit_len, SERVER_SETUP_MAX_ATTEMPT_COUNT, rng
                )
            m, cols = mat_d.shape

            if mesh is not None:
                server, hint = cls._setup_sharded(seed, mat_d, bit_len, prg_mode, mesh)
            elif backend == "numpy":
                mat_a = prg.expand_seed(LWE_DIMENSION, m, seed, mode=prg_mode)
                hint = (mat_a.astype(np.uint64) @ mat_d.astype(np.uint64)).astype(np.uint32)
                server = cls("numpy", mat_d, m, cols, bit_len)
            else:
                server, hint = cls._setup_jax(
                    seed, mat_d, bit_len, layout, prg_mode, hint_block_rows
                )

        return server, matrix_io.matrix_to_bytes(hint), filt.to_bytes()

    @classmethod
    def _setup_sharded(cls, seed, mat_d, bit_len, prg_mode, mesh):
        """Multi-chip setup: packed planes row-sharded over the `model`
        axis, hint computed as sharded packed matvecs over host A blocks."""
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        import jax

        from ..parallel import build_sharded_pallas_db, sharded_hint_packed_fn
        from ..utils import telemetry

        m, cols = mat_d.shape
        with telemetry.span("server_setup.pack_and_shard", m=m, cols=cols):
            db = build_sharded_pallas_db(mesh, mat_d, bit_len)
        m_pad = db.lo.shape[0]

        if prg_mode == "ctr":
            # A never exists on the host: every shard regenerates the slab
            # from the seed on device and folds its local column range
            import jax.numpy as jnp

            from ..ops import prg_jax
            from ..parallel import sharded_hint_ctr_packed_fn

            rows_per_step = min(128, LWE_DIMENSION)
            seed_words = prg_jax.seed_to_words(seed)
            hint_step = sharded_hint_ctr_packed_fn(mesh, db, rows_per_step, m)
            hint_parts = []
            with telemetry.span("server_setup.hint_sharded_ctr", m_pad=m_pad):
                for r0 in range(0, LWE_DIMENSION, rows_per_step):
                    word0 = r0 * m
                    blk0 = (word0 * 4) // 168
                    blk0_words = jnp.asarray(
                        np.array([blk0 & 0xFFFFFFFF, blk0 >> 32], np.uint32)
                    )
                    out = hint_step(
                        seed_words, blk0_words, jnp.int32(word0 - blk0 * 42)
                    )
                    r = min(rows_per_step, LWE_DIMENSION - r0)
                    hint_parts.append((r, out))
                hint = np.concatenate(
                    [np.asarray(h)[:r] for r, h in hint_parts], axis=0
                ).astype(np.uint32)
            return cls("jax", db, m, cols, bit_len, "packed", mesh=mesh), hint

        hint_step = sharded_hint_packed_fn(mesh, db)
        block_rows = max(1, (16 << 20) // max(1, 4 * m))
        block_rows = min(block_rows, LWE_DIMENSION)
        hint_parts = []
        with telemetry.span("server_setup.hint_sharded", m_pad=m_pad):
            for _, block in prg.prefetch_iter(
                prg.iter_row_blocks(LWE_DIMENSION, m, seed, block_rows, mode=prg_mode)
            ):
                r = block.shape[0]
                if r < block_rows:
                    block = np.pad(block, ((0, block_rows - r), (0, 0)))
                block = np.pad(block, ((0, 0), (0, m_pad - m)))
                hint_parts.append((r, hint_step(block)))
            hint = np.concatenate(
                [np.asarray(h)[:r] for r, h in hint_parts], axis=0
            ).astype(np.uint32)
        return cls("jax", db, m, cols, bit_len, "packed", mesh=mesh), hint

    @classmethod
    def _setup_jax(cls, seed, mat_d, bit_len, layout, prg_mode, hint_block_rows):
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        import jax
        import jax.numpy as jnp

        from ..ops import digits, matmul_u32, respond_pallas

        m, cols = mat_d.shape
        if layout == "auto":
            # the packed Pallas layout reads ~1-1.5 B/element instead of 2;
            # use it wherever the high byte packs below a full byte
            layout = "packed" if bit_len <= 12 else "digit2"

        # Stream A row blocks host->device, folding each into M = A . D.
        # Block size targets ~16 MB transfers (the sweet spot for the host
        # link). Every block is padded to the same shape so the device
        # matmul compiles exactly once.
        if hint_block_rows is None:
            hint_block_rows = max(1, (16 << 20) // max(1, 4 * m))
        hint_block_rows = min(hint_block_rows, LWE_DIMENSION)

        from ..utils import telemetry

        if layout == "packed":
            with telemetry.span("server_setup.pack_and_upload", m=m, cols=cols):
                db = respond_pallas.build_pallas_db(mat_d, bit_len)

            # The hint matmul IS a batched respond: each A row block is a
            # batch of hint_block_rows "queries". The hint accumulates in
            # a device buffer; only the final (1774 x cols) matrix crosses
            # back to the host. In ctr mode the A rows are generated
            # on-device too — setup then uploads nothing but the DB.
            n_blocks = -(-LWE_DIMENSION // hint_block_rows)
            pad_rows = n_blocks * hint_block_rows

            if prg_mode == "ctr":
                from ..ops import prg_jax

                # A is generated on-device (Pallas Keccak), so slabs are
                # bounded by HBM, not the host link: 128 rows of A is
                # ~0.6 GB at the largest single-chip DB. (Bigger slabs
                # would save a few tunnel dispatches, but every program
                # shape costs a remote compile on first use — 128 stays
                # aligned with the warmed cache.)
                rows_per_step = min(128, LWE_DIMENSION)
                n_steps = -(-LWE_DIMENSION // rows_per_step)
                pad_rows = n_steps * rows_per_step
                seed_words = prg_jax.seed_to_words(seed)

                # separately-jitted stages: fusing the Keccak generator,
                # the respond kernel, and the slice update into one
                # program sends the compiler into the weeds.
                # seed_words is an ARGUMENT, not a closure capture: captured
                # arrays are baked into the program as constants, so every
                # new seed would be a fresh (remote, minutes-long) compile.
                @partial(jax.jit, static_argnames=("nrows", "ncols"))
                def gen_slab(sw, blk0_words, offset, nrows, ncols):
                    return prg_jax.rows_from_blocks(
                        sw, blk0_words, offset, nrows, ncols
                    )

                @partial(jax.jit, donate_argnums=0)
                def write_rows(hint_buf, out, r0):
                    return jax.lax.dynamic_update_slice(hint_buf, out, (r0, jnp.int32(0)))

                with telemetry.span("server_setup.hint_ctr_on_device", steps=n_steps):
                    hint_buf = jnp.zeros((pad_rows, cols), jnp.uint32)
                    for r0 in range(0, LWE_DIMENSION, rows_per_step):
                        word0 = r0 * m
                        blk0 = (word0 * 4) // 168
                        blk0_words = jnp.asarray(
                            np.array([blk0 & 0xFFFFFFFF, blk0 >> 32], np.uint32)
                        )
                        a_slab = gen_slab(
                            seed_words,
                            blk0_words,
                            jnp.int32(word0 - blk0 * 42),
                            rows_per_step,
                            m,
                        )
                        out = respond_pallas.respond_batch_packed(a_slab, db)
                        hint_buf = write_rows(hint_buf, out, jnp.int32(r0))
                    hint = np.asarray(hint_buf)[:LWE_DIMENSION].astype(np.uint32)
                return cls("jax", db, m, cols, bit_len, "packed"), hint

            # planes are jit ARGUMENTS (see respond_packed_core) so the
            # compiled program is reused across databases of one geometry
            interpret = jax.default_backend() == "cpu"

            @partial(
                jax.jit,
                donate_argnums=0,
                static_argnames=("bit_len", "ncols", "tile_k", "interp"),
            )
            def hint_step(hint_buf, block, r0, lo, hi, bit_len, ncols, tile_k, interp):
                out = respond_pallas.respond_packed_core(
                    block, lo, hi, bit_len, ncols, tile_k, interp
                )
                return jax.lax.dynamic_update_slice(
                    hint_buf, out, (r0, jnp.int32(0))
                )

            with telemetry.span("server_setup.hint_stream", blocks=n_blocks):
                hint_buf = jnp.zeros((pad_rows, cols), jnp.uint32)
                blocks = prg.prefetch_iter(
                    prg.iter_row_blocks(LWE_DIMENSION, m, seed, hint_block_rows)
                )
                for r0, block in blocks:
                    if block.shape[0] < hint_block_rows:
                        block = np.pad(block, ((0, hint_block_rows - block.shape[0]), (0, 0)))
                    hint_buf = hint_step(
                        hint_buf, jax.device_put(block), jnp.int32(r0),
                        db.lo, db.hi, bit_len, cols, db.tile_k, interpret,
                    )
                hint = np.asarray(hint_buf)[:LWE_DIMENSION].astype(np.uint32)
            return cls("jax", db, m, cols, bit_len, "packed"), hint

        p0_host, p1_host = digits.db_digit_planes_np(mat_d)
        d0 = jax.device_put(p0_host)
        d1 = jax.device_put(p1_host)
        hint_rows = []
        for r0, block in prg.prefetch_iter(
            prg.iter_row_blocks(LWE_DIMENSION, m, seed, hint_block_rows, mode=prg_mode)
        ):
            r = block.shape[0]
            if r < hint_block_rows:
                block = np.pad(block, ((0, hint_block_rows - r), (0, 0)))
            acc = jnp.zeros((hint_block_rows, cols), jnp.int32)
            acc = matmul_u32.digit_matmul_accumulate(acc, jax.device_put(block), d0, d1)
            hint_rows.append((r, acc))
        hint = np.concatenate(
            [np.asarray(h)[:r] for r, h in hint_rows], axis=0
        ).astype(np.uint32)
        return cls("jax", (d0, d1), m, cols, bit_len, "digit2"), hint

    # -- online --------------------------------------------------------------

    def respond(self, query: bytes) -> bytes:
        """Answer a single serialized client query
        (reference: server.rs:184-190)."""
        q = matrix_io.matrix_from_bytes(query)
        if q.shape[0] != 1 or q.shape[1] != self._num_query_cols:
            raise IncompatibleDimensionForRowVectorTransposedMatrixMultiplication()
        out = self.respond_batch(q)
        return matrix_io.matrix_to_bytes(out)

    def respond_batch(self, queries: np.ndarray) -> np.ndarray:
        """(Q, m) uint32 -> (Q, C) uint32. Batches ride a single MXU matmul."""
        queries = np.asarray(queries, np.uint32)
        if queries.ndim != 2 or queries.shape[1] != self._num_query_cols:
            raise IncompatibleDimensionForRowVectorTransposedMatrixMultiplication()
        if self._backend == "numpy":
            return (
                queries.astype(np.uint64) @ self._planes.astype(np.uint64)
            ).astype(np.uint32)
        import jax

        if self._sharded_respond is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self._mesh
            m_pad = self._planes.lo.shape[0]
            data = mesh.shape["data"]
            q = queries.shape[0]
            q_pad = -(-q // data) * data
            queries = np.pad(queries, ((0, q_pad - q), (0, m_pad - queries.shape[1])))
            q_dev = jax.device_put(
                queries, NamedSharding(mesh, P("data", "model"))
            )
            out = np.asarray(self._sharded_respond(q_dev)).astype(np.uint32)
            return out[:q]

        if self._layout == "packed":
            from ..ops import respond_pallas

            out = respond_pallas.respond_batch_packed(jax.device_put(queries), self._planes)
        else:
            from ..ops import respond as respond_ops

            d0, d1 = self._planes
            out = respond_ops.respond_batch(jax.device_put(queries), d0, d1)
        return np.asarray(out).astype(np.uint32)

    @property
    def num_query_cols(self) -> int:
        return self._num_query_cols

    @property
    def num_response_cols(self) -> int:
        return self._num_response_cols

    # -- persistence ---------------------------------------------------------
    #
    # The reference has no long-job checkpointing; its serialization formats
    # *are* the state transfer (SURVEY.md section 5). We go one step further
    # and let a server persist its full online state, so a restarted
    # process can resume serving without re-running setup.

    def save(self, path: str) -> None:
        """Persist the online serving state (not the hint/filter — those
        already left the building at setup time)."""
        meta = dict(
            backend=self._backend,
            layout=self._layout,
            num_query_cols=self._num_query_cols,
            num_response_cols=self._num_response_cols,
            mat_elem_bit_len=self.mat_elem_bit_len,
        )
        if self._backend == "numpy":
            np.savez(path, meta=np.array([repr(meta)]), mat_d=self._planes)
        elif self._layout == "packed":
            db = self._planes
            arrays = dict(lo=np.asarray(db.lo), tile_k=np.array([db.tile_k]))
            if db.hi is not None:
                arrays["hi"] = np.asarray(db.hi)
            np.savez(path, meta=np.array([repr(meta)]), **arrays)
        else:
            d0, d1 = self._planes
            np.savez(path, meta=np.array([repr(meta)]), d0=np.asarray(d0), d1=np.asarray(d1))

    @classmethod
    def load(cls, path: str) -> "Server":
        """Rebuild a serving-ready Server from a save() archive."""
        import ast

        with np.load(path) as archive:
            meta = ast.literal_eval(str(archive["meta"][0]))
            if meta["backend"] == "numpy":
                planes = archive["mat_d"]
            elif meta["layout"] == "packed":
                import jax

                from ..ops.respond_pallas import PallasDB

                planes = PallasDB(
                    lo=jax.device_put(archive["lo"]),
                    hi=jax.device_put(archive["hi"]) if "hi" in archive else None,
                    mat_elem_bit_len=meta["mat_elem_bit_len"],
                    num_rows=meta["num_query_cols"],
                    num_cols=meta["num_response_cols"],
                    tile_k=int(archive["tile_k"][0]),
                )
            else:
                import jax

                planes = (jax.device_put(archive["d0"]), jax.device_put(archive["d1"]))
        return cls(
            meta["backend"],
            planes,
            meta["num_query_cols"],
            meta["num_response_cols"],
            meta["mat_elem_bit_len"],
            meta["layout"],
        )


@contextlib.contextmanager
def _gc_paused():
    was_enabled = gc.isenabled()
    gc.disable()
    try:
        yield
    finally:
        if was_enabled:
            gc.enable()


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        try:
            import jax  # noqa: F401

            return "jax"
        except Exception:  # pragma: no cover
            return "numpy"
    if backend == "jax":
        try:
            import jax  # noqa: F401
        except Exception as e:  # pragma: no cover - no jax in this deploy
            from ..errors import AcceleratorError

            raise AcceleratorError(f"jax backend requested but unavailable: {e}")
    if backend not in ("jax", "numpy"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend
