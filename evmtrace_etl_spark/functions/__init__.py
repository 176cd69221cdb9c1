"""Scalar function layer: EVM hex/selector helpers, Keccak/EIP-55, and
text-analysis column functions."""

from .evm import (
    EC_ADD_ADDRESS,
    EC_MUL_ADDRESS,
    EC_PAIRING_ADDRESS,
    EC_RECOVER_ADDRESS,
    FIRST_DEGREE_FILTER_ADDRESSES,
    ZERO_ADDRESS,
    ZERO_SELECTOR,
    ec_recover_address,
    hex_byte_length,
    is_precompile,
    pairing_input_size,
    selector,
    selector_masked,
    to_checksum_udf,
)
from .keccak import keccak256, to_checksum_address

__all__ = [
    "EC_ADD_ADDRESS",
    "EC_MUL_ADDRESS",
    "EC_PAIRING_ADDRESS",
    "EC_RECOVER_ADDRESS",
    "FIRST_DEGREE_FILTER_ADDRESSES",
    "ZERO_ADDRESS",
    "ZERO_SELECTOR",
    "ec_recover_address",
    "hex_byte_length",
    "is_precompile",
    "pairing_input_size",
    "selector",
    "selector_masked",
    "to_checksum_udf",
    "keccak256",
    "to_checksum_address",
]
