"""Native host engine (C++ via ctypes), built on demand.

The engine accelerates the strictly-sequential host paths (XOF stream,
filter peel, row assembly); every function has a numpy fallback in
`chalametpir_tpu.core`, and the test suite asserts both agree.
"""
