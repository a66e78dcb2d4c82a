"""Key / ciphertext serialization (checkpoint-resume).

The reference has none — keys and ciphertexts live only in device memory for
one process lifetime (SURVEY §5).  Here: a compact .npz container with a
params fingerprint so a restored object is guaranteed to match its context.
"""

from __future__ import annotations

import hashlib
import json
from typing import Union

import jax.numpy as jnp
import numpy as np

from ..config import GLParams
from ..models.he import Ciphertext, SecretKey


def params_fingerprint(p: GLParams) -> str:
    blob = json.dumps({
        "n": p.n, "p": p.p, "moduli": list(p.moduli), "delta": p.delta,
    }, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_ciphertext(path: str, ct: Ciphertext, params: GLParams) -> None:
    np.savez_compressed(path, b=np.asarray(ct.b), a=np.asarray(ct.a),
                        fp=params_fingerprint(params))


def load_ciphertext(path: str, params: GLParams) -> Ciphertext:
    z = np.load(path)
    _check(z, params)
    return Ciphertext(b=jnp.asarray(z["b"]), a=jnp.asarray(z["a"]))


def save_secret_key(path: str, sk: SecretKey, params: GLParams) -> None:
    np.savez_compressed(path, s_mont=np.asarray(sk.s_mont),
                        fp=params_fingerprint(params))


def load_secret_key(path: str, params: GLParams) -> SecretKey:
    z = np.load(path)
    _check(z, params)
    return SecretKey(s_mont=jnp.asarray(z["s_mont"]))


def _check(z, params: GLParams) -> None:
    fp = str(z["fp"])
    want = params_fingerprint(params)
    if fp != want:
        raise ValueError(
            f"checkpoint was written for params {fp}, context has {want}")


def save_matmul_tensor(path: str, tt, params: GLParams) -> None:
    """Checkpoint a homomorphic-GEMM tensor (models/he_matmul.MatmulTensor):
    the rank-2 object a server ships back for two-sided-key decryption."""
    np.savez_compressed(path, fp=params_fingerprint(params),
                        **{k: np.asarray(v) for k, v in tt._asdict().items()})


def load_matmul_tensor(path: str, params: GLParams):
    from ..models.he_matmul import MatmulTensor
    z = np.load(path)
    _check(z, params)
    return MatmulTensor(**{k: jnp.asarray(z[k])
                           for k in MatmulTensor._fields})
