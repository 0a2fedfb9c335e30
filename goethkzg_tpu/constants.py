"""Protocol and curve constants for the TPU-native EIP-4844/EIP-7594 KZG library.

Mirrors the spec constants of the reference implementation
(reference: serialization.go:26-54, api.go:31-49) and the BLS12-381 curve
parameters. Everything here is plain Python ints / bytes — device-side limb
encodings are derived in `ops.field`.
"""

# ---------------------------------------------------------------------------
# Spec constants (reference: serialization.go)
# ---------------------------------------------------------------------------
COMPRESSED_G1_SIZE = 48
COMPRESSED_G2_SIZE = 96
SERIALIZED_SCALAR_SIZE = 32
SCALARS_PER_BLOB = 4096
SCALARS_PER_CELL = 64
CELLS_PER_EXT_BLOB = 128
EXPANSION_FACTOR = 2
SCALARS_PER_EXT_BLOB = EXPANSION_FACTOR * SCALARS_PER_BLOB  # 8192
BYTES_PER_BLOB = SCALARS_PER_BLOB * SERIALIZED_SCALAR_SIZE  # 131072
BYTES_PER_CELL = SCALARS_PER_CELL * SERIALIZED_SCALAR_SIZE  # 2048

# Fiat-Shamir domain separator (reference: fiatshamir.go:15)
DOM_SEP_PROTOCOL = b"FSBLOBVERIFY_V1_"

# Serialized point at infinity in G1 (reference: api.go:46-49)
G1_POINT_AT_INFINITY = bytes([0xC0] + [0] * 47)

# ---------------------------------------------------------------------------
# BLS12-381 parameters
# ---------------------------------------------------------------------------
# Scalar field modulus r (255 bits)
R_MOD = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
# Base field modulus p (381 bits)
P_MOD = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# Curve equations: G1: y^2 = x^3 + 4 over Fp;  G2: y^2 = x^3 + 4(1+i) over Fp2
G1_B = 4
G2_B = (4, 4)

# BLS parameter x (the curve is parameterized by this; x is negative)
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True

# G1 generator (standard, matches gnark / ZCash serialization suite)
G1_GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

# G2 generator
G2_GEN_X = (
    0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
    0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
)
G2_GEN_Y = (
    0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
    0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
)

# Generator of the largest power-of-two multiplicative subgroup of Fr
# (order 2^32).  reference: internal/domain/domain.go:61
ROOT_OF_UNITY_2E32 = 10238227357739495823651030575849232062558860180284477541189508159991286009131
MAX_ORDER_ROOT = 32

# Coset generator used by the erasure-code recovery path
# (reference: internal/erasure_code/erasure_code.go:60)
RECOVERY_COSET_GEN = 7
