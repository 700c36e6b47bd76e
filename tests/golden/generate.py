"""Regenerate the golden interop fixtures (GOLDEN_REGEN=1 to overwrite).

Run from the repo root: GOLDEN_REGEN=1 python tests/golden/generate.py
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import chalametpir_tpu.models.client as client_mod  # noqa: E402
from chalametpir_tpu import Client, Server  # noqa: E402
from chalametpir_tpu.core import prg  # noqa: E402
from chalametpir_tpu.core.codec import encode_kv_as_row  # noqa: E402
from chalametpir_tpu.core.hashing import hash_of_key  # noqa: E402

GOLDEN = os.path.dirname(os.path.abspath(__file__))
SEED = bytes(range(32))


def write(name: str, data: bytes) -> None:
    path = os.path.join(GOLDEN, name)
    if os.path.exists(path) and os.environ.get("GOLDEN_REGEN") != "1":
        raise SystemExit(f"{name} exists; set GOLDEN_REGEN=1 to overwrite")
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {name} ({len(data)} bytes)")


def main() -> None:
    write("seed_to_a_prefix.bin", prg.expand_seed(2, 32, SEED, mode="stream").astype("<u4").tobytes())
    write("seed_to_a_ctr_prefix.bin", prg.expand_seed(2, 32, SEED, mode="ctr").astype("<u4").tobytes())

    digest = np.asarray(hash_of_key(b"golden-key")).astype("<u8").tobytes()
    write("key_digest.bin", digest)
    write("encoded_row_b10.bin", encode_kv_as_row(digest, b"golden-value", 10, 40).astype("<u4").tobytes())

    db = {
        f"key-{i:02d}".encode(): bytes((i * 7 + j) % 256 for j in range(i + 1))
        for i in range(32)
    }
    server, hint_bytes, fparams = Server.setup(
        SEED, db, arity=3, backend="numpy", rng=np.random.default_rng(1234)
    )
    write("filter_params.bin", fparams)

    orig = client_mod.os.urandom
    client_mod.os.urandom = lambda n: bytes(range(n))
    try:
        client = Client.setup(SEED, hint_bytes, fparams, device=False)
        query = client.query(b"key-05")
    finally:
        client_mod.os.urandom = orig
    response = server.respond(query)
    write("response.bin", response)
    assert client.process_response(b"key-05", response) == db[b"key-05"]

    from chalametpir_tpu.core.filter import BinaryFuseFilter

    filt = BinaryFuseFilter.from_bytes(fparams)
    manifest = {
        "seed": SEED.hex(),
        "hint_sha256": hashlib.sha256(hint_bytes).hexdigest(),
        "query_sha256": hashlib.sha256(query).hexdigest(),
        "num_fingerprints": filt.num_fingerprints,
        "mat_elem_bit_len": filt.mat_elem_bit_len,
    }
    path = os.path.join(GOLDEN, "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    print("wrote manifest.json")


if __name__ == "__main__":
    main()
