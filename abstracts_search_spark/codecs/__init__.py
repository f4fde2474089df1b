from .varint import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
)

__all__ = ["encode_varint", "decode_varint", "delta_encode", "delta_decode"]
