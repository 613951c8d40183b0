"""Reference-oracle machinery.

Makes the ACTUAL reference implementation at /root/reference/src/f5_tts
importable offline (see shims.py / loader.py) so parity tests compare the
JAX framework against the real reference code instead of from-spec twins.
"""
