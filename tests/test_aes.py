"""Known-answer tests for functions/aes.py (FIPS-197 + NIST SP 800-38A).

The AES core backs the PDF standard-security-handler decrypt path
(operators/parse_binary.py AESV2/AESV3); a silent failure there degrades
encrypted-PDF text to '' with no error, so the cipher itself is pinned to
the published vectors.
"""

from __future__ import annotations

from nutch_spark.functions.aes import (
    cbc_decrypt,
    cbc_encrypt,
    decrypt_block,
    encrypt_block,
    expand_key,
)

# ---------------------------------------------------------------------------
# FIPS-197 Appendix C example vectors (PLAINTEXT 00112233..ff, KEY 000102..)
# ---------------------------------------------------------------------------

_FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS_VECTORS = [
    # (key hex, expected ciphertext hex) — FIPS-197 C.1 / C.2 / C.3
    ("000102030405060708090a0b0c0d0e0f", "69c4e0d86a7b0430d8cdb78070b4c55a"),
    (
        "000102030405060708090a0b0c0d0e0f1011121314151617",
        "dda97ca4864cdfe06eaf70a0ec0d7191",
    ),
    (
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
        "8ea2b7ca516745bfeafc49904b496089",
    ),
]


def test_fips197_appendix_c_encrypt():
    for key_hex, ct_hex in _FIPS_VECTORS:
        ks = expand_key(bytes.fromhex(key_hex))
        assert encrypt_block(ks, _FIPS_PT).hex() == ct_hex


def test_fips197_appendix_c_decrypt():
    for key_hex, ct_hex in _FIPS_VECTORS:
        ks = expand_key(bytes.fromhex(key_hex))
        assert decrypt_block(ks, bytes.fromhex(ct_hex)) == _FIPS_PT


def test_fips197_appendix_b_single_block():
    # FIPS-197 Appendix B worked example (the classic Rijndael vector)
    ks = expand_key(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    ct = encrypt_block(ks, bytes.fromhex("3243f6a8885a308d313198a2e0370734"))
    assert ct.hex() == "3925841d02dc09fbdc118597196a0b32"


# ---------------------------------------------------------------------------
# NIST SP 800-38A §F.2 CBC example vectors
# ---------------------------------------------------------------------------

_SP_IV = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
_SP_PT = bytes.fromhex(
    "6bc1bee22e409f96e93d7e117393172a"
    "ae2d8a571e03ac9c9eb76fac45af8e51"
    "30c81c46a35ce411e5fbc1191a0a52ef"
    "f69f2445df4f9b17ad2b417be66c3710"
)


def test_sp800_38a_cbc_aes128():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    ct = bytes.fromhex(
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
        "73bed6b8e3c1743b7116e69e22229516"
        "3ff1caa1681fac09120eca307586e1a7"
    )
    assert cbc_encrypt(key, _SP_IV, _SP_PT) == ct
    assert cbc_decrypt(key, _SP_IV, ct) == _SP_PT


def test_sp800_38a_cbc_aes256():
    key = bytes.fromhex(
        "603deb1015ca71be2b73aef0857d77811f352c073b6108d72d9810a30914dff4"
    )
    ct = bytes.fromhex(
        "f58c4c04d6e5f1ba779eabfb5f7bfbd6"
        "9cfc4e967edb808d679f777bc6702c7d"
        "39f23369a9d9bacfa530e26304231461"
        "b2eb05e2c39be9fcda6c19078c6a9d1b"
    )
    assert cbc_encrypt(key, _SP_IV, _SP_PT) == ct
    assert cbc_decrypt(key, _SP_IV, ct) == _SP_PT


def test_cbc_round_trip_multiblock():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    pt = bytes(range(256)) * 2  # 32 blocks
    assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, pt)) == pt


def test_cbc_decrypt_tolerates_ragged_tail():
    # the PDF path may hand a ciphertext with a truncated trailing block;
    # cbc_decrypt drops the ragged tail rather than raising
    key = bytes(16)
    iv = bytes(16)
    ct = cbc_encrypt(key, iv, bytes(32))
    assert cbc_decrypt(key, iv, ct + b"\x01\x02") == bytes(32)
