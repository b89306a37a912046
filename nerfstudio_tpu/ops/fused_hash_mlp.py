"""Placeholder for the Pallas fused hash-encode+MLP kernel (tcnn
NetworkWithInputEncoding equivalent). The XLA composed path in
field_components/mlp.py is the fallback; this module gates availability."""


def fused_hash_mlp_available() -> bool:
    return False


def apply_fused(module, encoding, mlp, x):  # pragma: no cover
    raise NotImplementedError
