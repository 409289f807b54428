"""Native RSA helpers for witness generation and test vectors (SURVEY N14 —
the reference uses the Rust `rsa`/`sha2` crates for the same purpose,
/root/reference/src/lib.rs:347-349,429).
"""
from __future__ import annotations

import hashlib

from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding, rsa


def generate_key(bits: int = 2048, e: int = 65537):
    """Returns (private_key_object, n, e)."""
    key = rsa.generate_private_key(public_exponent=e, key_size=bits)
    n = key.public_key().public_numbers().n
    return key, n, e


def load_fixed_key(path: str):
    """Load the pinned test key (tests/golden/rsa_key_2048.json) so bench
    and regression runs are bit-reproducible across invocations.  Returns
    (private_key_object, n, e)."""
    import json
    d = json.load(open(path))
    p, q, e = d["p"], d["q"], d["e"]
    n = p * q
    dmp = pow(e, -1, p - 1)
    dmq = pow(e, -1, q - 1)
    iqmp = pow(q, -1, p)
    dd = pow(e, -1, (p - 1) * (q - 1))
    key = rsa.RSAPrivateNumbers(
        p=p, q=q, d=dd, dmp1=dmp, dmq1=dmq, iqmp=iqmp,
        public_numbers=rsa.RSAPublicNumbers(e=e, n=n)).private_key()
    return key, n, e


def sign_pkcs1v15_sha256(key, msg: bytes) -> int:
    sig = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    return int.from_bytes(sig, "big")


def sha256_words_le(msg: bytes) -> list[int]:
    """SHA-256 digest as the 4 low-to-high 64-bit words of the PKCS#1 v1.5
    encoded message (the digest sits in em's least-significant 32 bytes, so
    word i covers digest bytes [32-8(i+1), 32-8i) big-endian — matching the
    reference's reverse-then-pack, lib.rs:222-239)."""
    h = hashlib.sha256(msg).digest()
    return [int.from_bytes(h[32 - 8 * (i + 1):32 - 8 * i], "big")
            for i in range(4)]


def digest_bytes(msg: bytes) -> bytes:
    return hashlib.sha256(msg).digest()
