"""Experimental kernels: working, correctness-tested code that measured
slower than the production (XLA) path on current hardware/toolchains.
Nothing here is wired into the library; import explicitly."""
