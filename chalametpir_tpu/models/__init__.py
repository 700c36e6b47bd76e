"""Protocol roles: the TPU-resident Server and the host-side Client."""
