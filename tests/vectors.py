"""Known-answer vectors imported from the reference test suite.

Every hex string below is transcribed from /root/reference/tests/*.cpp (file:line
cited per group). These are the bit-exactness contract: the TPU framework must
reproduce each one exactly.
"""

H = lambda s: int(s, 16)

# --- tests/mgry.cpp --------------------------------------------------------

# Prime used by all Montgomery tests (tests/mgry.cpp:26): secp256k1 p.
MGRY_P = H("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F")

# Mgry.FromTo round-trip values (tests/mgry.cpp:35-43)
MGRY_FROMTO = [
    H("eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
    H("0168db3a8eca3fd7d4d08943182e189aef318068ba8853d77cb49c17bae00c0e"),
    H("2714dac0b974321b75d6ef64e7c3b118adb2801bf674282df5712cd2af390f79"),
    H("a3fc64fece6f3e1effab4045a9a54faa49a228f787025f0ecb761145755cb2d0"),
    H("3af178b78710adae9cc096188ed09c210078aaa7e965ef83d22a91f21fec4eb5"),
    H("688c743cde3987e299d2b028038ddc12dc02e7033c9d3c8f4d20edf9544232aa"),
    H("45e29166c6441f0fd27e3b85a205f1e102b025cc8e8ea158ab4885a22ed68905"),
]

# Mgry.Reduce differential pairs (tests/mgry.cpp:65-76): mont_reduce(a*b)
MGRY_REDUCE_PAIRS = [
    (H("4"), H("5")),
    (
        H("00000000000AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"),
        H("00000000000BBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB"),
    ),
]

# Mgry.Ops vectors (tests/mgry.cpp:82-120)
MGRY_OPS_A = H("FFFFFFFFFFFFFFFFFFFFFF000000000000000000000000000000000000000004")
MGRY_OPS_B = H("FFFFFFFFFFFFFFFFFFFFFF000000000000000000000000000000000000000005")
MGRY_OPS_ADD = H("fffffffffffffffffffffe0000000000000000000000000000000001000003da")
MGRY_OPS_SUB_AB = H("fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2e")
MGRY_OPS_SUB_BA = H("0000000000000000000000000000000000000000000000000000000000000001")
# (exponent, expected a^e mod p) pairs
MGRY_OPS_POW = [
    (
        H("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2D"),
        H("DC1B98237FD316F9AEE7342E6DC7629A75A99A9E9EF591170282CE3E1D8E26ED"),
    ),
    (
        H("2"),
        H("fffffffffffffdfffff85600000000000001000003d10001000007a9000eab68"),
    ),
    (
        H("00000000000F0000000000000000000000000000000000000000000000000001"),
        H("a51e978903ca7fcd788382ff283366ad7457d27c7aac417127a8723626773516"),
    ),
    (H("0"), H("1")),
]

# Mgry.Gfp vectors (tests/mgry.cpp:122-150)
GFP_INV_IN = MGRY_OPS_A
GFP_INV_OUT = H("DC1B98237FD316F9AEE7342E6DC7629A75A99A9E9EF591170282CE3E1D8E26ED")
GFP_SQRT_IN = H("b560fd7b259468b53c3a1623f35786a491fcb1fcdfbb0165da4dccce1f185b60")
GFP_SQRT_OUT = H("a59f1be7c1f892ff2adf14187e9cff7666112af579bc1a11b63e248098567e71")

# --- tests/ops.cpp ---------------------------------------------------------

# Ops128.Binops adds (tests/ops.cpp:72-77), 128-bit truncating adds
OPS128_ADD = [
    (
        H("00000000000000000000000500000005"),
        H("0000000000000000FFFFFFFFFFFFFFFF"),
        H("00000000000000010000000500000004"),
    ),
    (
        H("909680e1f399ca5916134a18b816399b"),
        H("0e36dfecf5e7f74363c453efc1cbc153"),
        H("9ecd60cee981c19c79d79e0879e1faee"),
    ),
]

# Ops128.Binops subs (tests/ops.cpp:80-81), truncating
OPS128_SUB = [
    (
        H("00000000000000000000000500000005"),
        H("0000000000000000FFFFFFFFFFFFFFFF"),
        H("ffffffffffffffff0000000500000006"),
    ),
]

# sub_if_above vectors (tests/ops.cpp:84-119), incl. per-lane-distinct batch
OPS128_SUB_IF_ABOVE = [
    (H("F0000000000000000000000000000005"), H("F0000000000000000000000000000004"), H("1")),
    (H("F0000000000000000000000000000004"), H("F0000000000000000000000000000004"), H("0")),
    (
        H("F0000000000000000000000000000003"),
        H("F0000000000000000000000000000004"),
        H("F0000000000000000000000000000003"),
    ),
    (H("F0000000000000000000000000000002"), H("F0000000000000000000000000000004"), H("F0000000000000000000000000000002")),
]

# Full multiplications (tests/ops.cpp:129-131, 217-219)
OPS_MUL = [
    (
        128,
        H("ffffffffffffffffffffffffffffffff"),
        H("eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
        H("EEEEEEEEEEEEEEEEEEEEEEEEEEEEEEED11111111111111111111111111111112"),
    ),
    (
        256,
        H("ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"),
        H("eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
        H(
            "EEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEEED"
            "1111111111111111111111111111111111111111111111111111111111111112"
        ),
    ),
]

# Limb multiplication (tests/ops.cpp:134-136): 128-bit x 32-bit -> 160-bit
OPS_LIMB_MUL = (
    H("e43aba669166dad6a334ad6bb13a2c9c"),
    198769,
    H("000000000002b436c2f33005f5c13775b7eefdc191e690dc"),
)

# Squares (tests/ops.cpp:139-144)
OPS_SQR = [
    (128, H("4"), H("10")),
    (
        128,
        H("ffffffffffffffffffffffffffffffff"),
        H("fffffffffffffffffffffffffffffffe00000000000000000000000000000001"),
    ),
    (
        128,
        H("b59edca51009bb15c309b23171c102da"),
        H("80da06968299ac8e1bc23ef95d49c1469d01bb136df7c96b75ba357dc0bc21a4"),
    ),
]

# Comparisons (tests/ops.cpp:147-152)
OPS_CMP_LT = (H("AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"), H("BAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"))

# Shift-left-one with per-lane carries (tests/ops.cpp:155-177)
OPS_SHL1 = [
    (H("80000000800000008000000080000000"), H("00000001000000010000000100000000"), 1),
    (H("70000000800000001000000000000001"), H("e0000001000000002000000000000002"), 0),
    (H("00000000000000000000000000000001"), H("00000000000000000000000000000002"), 0),
    (H("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF"), H("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFE"), 1),
]

# Ops256.Mod vectors vs secp256k1 p (tests/ops.cpp:221-252)
MOD_P = MGRY_P
MOD_ADD = [
    (
        H("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2E"),
        H("2"),
        H("1"),
    ),
    (
        H("fffffffffffffffffffffffffffffffffffffffffffffffffffffff000000000"),
        H("ffeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
        H("ffeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeedfeeeef2bf"),
    ),
]
MOD_SUB = [
    (
        H("fffffffffffffffffffffffffffffffffffffffffffffffffffffff000000000"),
        H("ffeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
        H("0011111111111111111111111111111111111111111111111111110111111112"),
    ),
]
MOD_SHL1 = [
    (
        H("fffffffffffffffffffffffffffffffffffffffffffffffffffffff000000000"),
        H("ffffffffffffffffffffffffffffffffffffffffffffffffffffffe1000003d1"),
    ),
]

# --- tests/curve_point.cpp ---------------------------------------------------

# CurvePoint.FromX decompression KAT (tests/curve_point.cpp:22-26)
FROMX_X = H("ce11d601ec0e947529e66021a0cd3d57518d58d0d5f2eb7ed75805d78c986e60")
FROMX_Y = H("f2a40cfbb248ae2c7749c76641b51b7137ccad8916931adf83b857e418fad591")

# --- tests/curve_group.cpp ---------------------------------------------------

# Affine multiples of the P-256 generator (tests/curve_group.cpp:49-51, 65-66, 92-93)
G2_X = H("7cf27b188d034f7e8a52380304b51ac3c08969e277f21b35a60b48fc47669978")
G2_Y = H("07775510db8ed040293d9ac69f7430dbba7dade63ce982299e04b79d227873d1")
G3_X = H("5ecbe4d1a6330a44c8f7ef951d4bf165e6c6b721efada985fb41661bc6e7fd6c")
G3_Y = H("8734640c4998ff7e374b06ce1a64a2ecd82ab036384fb83d9a79b127a27d5032")
G5_X = H("51590b7a515140d2d784c85608668fdfef8c82fd1f5be52421554a0dc3d033ed")
G5_Y = H("e0c17da8904a727d8ae1bf36bf8a79260d012f00d4d80888d1d0bb44fda16da4")

# ScalarMult KATs (tests/curve_group.cpp:117-173): (scalar, x, y)
SCALAR_MULT_KATS = [
    (H("5"), G5_X, G5_Y),
    (
        H("0bc1b1f28709decb543d9677d2cc9942348f6b984deff409430740942ff38827"),
        H("1b7721565b2c4a9f203bbccc6b531df2789fde0d135c76db71e4a7bbab9e85b2"),
        H("393655bcc30f67f3a4e257b39685657d7c8df7b2a132b49c848003e300c8dcd1"),
    ),
    (
        H("0a891cecc2bf13b0aca744434a9c9f4bd7bf5c8ed86e2f76e7df72bad813bd80"),
        H("f411d79e2997b2954975046d23b0e4a69ce580a4a81e1bed18fef6fd9ea4a912"),
        H("43895f527937e816c3d7c0a2370002796d3cd4860cb034df86cbe7da227d9113"),
    ),
]
