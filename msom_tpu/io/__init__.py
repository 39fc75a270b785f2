from msom_tpu.io.bas import read_bas, write_bas

__all__ = ["read_bas", "write_bas"]
