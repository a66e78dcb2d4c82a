"""Leveled CKKS context chain: automatic level / scale bookkeeping.

A SEAL-style "context chain" the reference has no analog of (its API stops
at raw tensor products, HE.cu:1727-1740): one object owns the per-level
parameter sets (the last prime dropped at each level), the per-level
HEContext / RelinContext / switching keys — all derived from ONE ternary
secret — and a `LeveledCt` wrapper carrying (level, scale) so that
multiply / rescale / rotate / add compose without manual modulus
bookkeeping.  tests/test_keyswitch.py::test_depth2_chain performs exactly
this dance by hand; LeveledChain is that dance as API.

Messages here are limb-consistent ring elements in W-eval layout (the
objects HEContext.encrypt consumes).  Scales multiply under homomorphic
multiplication and divide by the dropped prime under rescale; decrypting
callers read `lct.scale` (the `delta_override` for decoding).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import GLParams
from .he import Ciphertext, HEContext, SecretKey
from . import rng as refrng
from .keyswitch import GaloisKeys, RelinContext, rescale_ciphertext


class LeveledCt(NamedTuple):
    """A ciphertext annotated with its chain position and plaintext scale."""
    ct: Ciphertext
    level: int
    scale: float


class LeveledChain:
    """Owns the leveled context tower over one base parameter set."""

    def __init__(self, params: GLParams, ring: str = "nega",
                 key: Optional[jax.Array] = None,
                 p_moduli: Optional[Sequence[int]] = None):
        if ring != "nega":
            # gl2 leveling runs through Gl2Context/Gl2GemmRelin (doubled X
            # frames); the folded GL ring admits no key switching at all
            # (keyswitch.py RelinContext docstring)
            raise ValueError("LeveledChain supports ring='nega'")
        self.base = params
        self.ring = ring
        self.depth = len(params.moduli) - 1  # deepest usable level index
        self._key = key if key is not None else jax.random.key(0)
        self._p_moduli = p_moduli
        self._ctx = {}
        self._rc = {}
        self._rlk = {}
        self._gk = {}

    # -- context tower -------------------------------------------------------

    def limbs_at(self, level: int) -> int:
        return len(self.base.moduli) - level

    def params_at(self, level: int) -> GLParams:
        if not 0 <= level <= self.depth:
            raise ValueError(f"level {level} outside chain [0, {self.depth}]")
        if level == 0:
            return self.base
        return dataclasses.replace(
            self.base, name=f"{self.base.name}-lvl{level}",
            moduli=self.base.moduli[:self.limbs_at(level)])

    def ctx(self, level: int) -> HEContext:
        if level not in self._ctx:
            self._ctx[level] = HEContext(self.params_at(level),
                                         ring=self.ring)
        return self._ctx[level]

    @functools.cached_property
    def _s_coeff0(self) -> jnp.ndarray:
        return jnp.asarray(refrng.ternary_secret(self.base))

    @functools.cached_property
    def _sk0(self) -> SecretKey:
        return self.ctx(0).generate_secret_key()

    def sk(self, level: int) -> SecretKey:
        """The one secret, restricted to the level's limb prefix (the
        ternary pattern is limb-consistent, so slicing is exact)."""
        return SecretKey(s_mont=self._sk0.s_mont[:self.limbs_at(level)])

    def rc(self, level: int) -> RelinContext:
        if level not in self._rc:
            self._rc[level] = RelinContext(self.ctx(level),
                                           p_moduli=self._p_moduli)
        return self._rc[level]

    def rlk(self, level: int):
        if level not in self._rlk:
            self._rlk[level] = self.rc(level).gen_relin_key(
                self._s_coeff0[:self.limbs_at(level)],
                jax.random.fold_in(self._key, level))
        return self._rlk[level]

    def galois(self, level: int, j: int) -> GaloisKeys:
        if (level, j) not in self._gk:
            self._gk[(level, j)] = GaloisKeys(
                self.rc(level), self._s_coeff0[:self.limbs_at(level)], [j],
                jax.random.fold_in(self._key, (level + 1) * 1000 + j))
        return self._gk[(level, j)]

    # -- leveled operations --------------------------------------------------

    def encrypt(self, m_eval: jnp.ndarray, level: int = 0,
                scale: Optional[float] = None) -> LeveledCt:
        """m_eval: limb-consistent message in W-eval layout for `level`'s
        limb count ([L_level, W, y, x])."""
        ct = self.ctx(level).encrypt(m_eval, self.sk(level))
        return LeveledCt(ct, level,
                         float(self.base.delta) if scale is None else scale)

    def multiply(self, a: LeveledCt, b: LeveledCt) -> LeveledCt:
        if a.level != b.level:
            raise ValueError(
                f"level mismatch {a.level} != {b.level}: mod_switch first")
        ct = self.rc(a.level).multiply_relinearize(a.ct, b.ct,
                                                   self.rlk(a.level))
        return LeveledCt(ct, a.level, a.scale * b.scale)

    def rescale(self, a: LeveledCt) -> LeveledCt:
        if a.level >= self.depth:
            raise ValueError("chain exhausted: no prime left to drop")
        q_last = int(self.params_at(a.level).moduli[-1])
        ct = rescale_ciphertext(self.ctx(a.level), a.ct)
        return LeveledCt(ct, a.level + 1, a.scale / q_last)

    def mod_switch(self, a: LeveledCt, level: int) -> LeveledCt:
        """Drop limbs without rescaling (exact for centered values below
        the reduced modulus; scale unchanged)."""
        if level < a.level:
            raise ValueError("cannot switch to a larger modulus")
        self.params_at(level)  # range-check the target level
        k = self.limbs_at(level)
        return LeveledCt(Ciphertext(b=a.ct.b[:k], a=a.ct.a[:k]),
                         level, a.scale)

    def add(self, a: LeveledCt, b: LeveledCt) -> LeveledCt:
        if a.level != b.level:
            raise ValueError(
                f"level mismatch {a.level} != {b.level}: mod_switch first")
        if abs(a.scale - b.scale) > 1e-6 * a.scale:
            raise ValueError(
                f"scale mismatch {a.scale} vs {b.scale}: rescale first")
        return LeveledCt(self.ctx(a.level).add_ciphertexts(a.ct, b.ct),
                         a.level, a.scale)

    def full_galois(self, level: int):
        """Shared log-size rotation key set for the level (FullGaloisKeys:
        ~10 stored keys cover every unit rotation)."""
        k = ("full", level)
        if k not in self._gk:
            from .keyswitch import FullGaloisKeys
            self._gk[k] = FullGaloisKeys(
                self.rc(level), self._s_coeff0[:self.limbs_at(level)],
                jax.random.fold_in(self._key, (level + 1) * 7919))
        return self._gk[k]

    def rotate(self, a: LeveledCt, j: int, full: bool = False) -> LeveledCt:
        """tau_j; full=True uses the shared log-size key set (more hops,
        ~log2 noise units) instead of one stored key per index."""
        gk = self.full_galois(a.level) if full else self.galois(a.level, j)
        return LeveledCt(gk.apply(a.ct, j), a.level, a.scale)

    def multiply_plain(self, a: LeveledCt, m, m_scale: float) -> LeveledCt:
        """Exact plaintext multiply (no keys, no fresh noise); scales
        multiply."""
        return LeveledCt(self.ctx(a.level).multiply_plain(a.ct, m),
                         a.level, a.scale * m_scale)

    def add_plain(self, a: LeveledCt, m) -> LeveledCt:
        """ct + plaintext (the plaintext must be encoded at a.scale)."""
        return LeveledCt(self.ctx(a.level).add_plain(a.ct, m),
                         a.level, a.scale)

    def decrypt_to_eval(self, a: LeveledCt) -> jnp.ndarray:
        return self.ctx(a.level).decrypt_to_eval(a.ct, self.sk(a.level))

    # -- complex (Gaussian-pair) messages ------------------------------------
    #
    # A packed complex message is a ciphertext PAIR (re, im) sharing one `a`
    # (encrypt_pair, HE.cu:1455).  These wrappers keep the pair moving
    # through the chain together; multiply_complex is the Gaussian-ring
    # product (RelinContext.multiply_relinearize_pair: W-slotwise, X-axis
    # negacyclic convolution).

    def encrypt_complex(self, m_re, m_im, level: int = 0,
                        scale: Optional[float] = None):
        ctx = self.ctx(level)
        ct_re, ct_im = ctx.encrypt_pair(m_re, m_im, self.sk(level))
        s = float(self.base.delta) if scale is None else scale
        return (LeveledCt(ct_re, level, s), LeveledCt(ct_im, level, s))

    @staticmethod
    def _check_pair(pair):
        ar, ai = pair
        if ar.level != ai.level:
            raise ValueError(
                f"pair halves at different levels ({ar.level}, {ai.level})")
        if abs(ar.scale - ai.scale) > 1e-6 * ar.scale:
            raise ValueError(
                f"pair halves at different scales ({ar.scale}, {ai.scale})")

    def multiply_complex(self, a_pair, b_pair):
        self._check_pair(a_pair)
        self._check_pair(b_pair)
        (ar, ai), (br, bi) = a_pair, b_pair
        if ar.level != br.level:
            raise ValueError("level mismatch across the pairs")
        outr, outi = self.rc(ar.level).multiply_relinearize_pair(
            ar.ct, ai.ct, br.ct, bi.ct, self.rlk(ar.level))
        s = ar.scale * br.scale
        return (LeveledCt(outr, ar.level, s), LeveledCt(outi, ar.level, s))

    def rescale_pair(self, pair):
        return (self.rescale(pair[0]), self.rescale(pair[1]))

    def decrypt_decode_complex(self, pair):
        """Decode a pair to complex matrices at ITS scale (the pair need
        not share an `a`: each half decrypts independently)."""
        self._check_pair(pair)
        ar, ai = pair
        ctx = self.ctx(ar.level)
        sk = self.sk(ar.level)
        return ctx.batched_encoder.decode_from_wntt_eval(
            ctx.decrypt_to_eval(ar.ct, sk), ctx.decrypt_to_eval(ai.ct, sk),
            delta_override=ar.scale)
