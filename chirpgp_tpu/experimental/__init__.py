"""Experimental components -- NOT part of the supported production surface.

``pallas_filter``: a fused VMEM square-root sigma-point filter kernel.
Validated against the XLA batched path in interpret mode and compiling
at tiny smoke shapes, but Mosaic compilation of the unrolled QR
reflections fails (remote-compile HTTP 500) at production shapes on the
available backend across two rounds of restructuring attempts; formally
retired from the production kernel claims per VERDICT r1/r2.  The XLA
channels-first batched kernels (``chirpgp_tpu.infer.batched``) are the
production fast path.
"""
