"""Host-side, bit-exact protocol core: hashing, codec, filter, wire formats."""
