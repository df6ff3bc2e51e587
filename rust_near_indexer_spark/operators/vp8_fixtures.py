"""Committed lossy-WebP (VP8 keyframe) fixtures for the oracle gate.

Six tiny RIFF/WEBP payloads (1.5 KB total) produced ONCE by the system
libwebp encoder (operators/webp_native.encode_rgb_advanced) across the
settings the spec decoder must survive: default config, low/high
quality, 4-segment segmentation, 4 token partitions, and the simple
loop filter.  At generation time operators/vp8.py's decode was
asserted BIT-EXACT in YUV against libwebp's own decode of the same
bytes; the per-fixture stats pinned in
queries/multimodal.image_webp_lossy_stats were computed from that
verified decode.  Baking the bytes in makes the driver-facing query
deterministic and libwebp-independent at run time — the gate then
pins that the executor-side spec decode still reproduces the verified
planes through the full router + Arrow plumbing.
"""

from __future__ import annotations

# (name, payload) in the stable order queries index with doc_id %% 6
VP8_FIXTURES = (
    ("flat_q75", bytes.fromhex(
        "524946462e000000574542505650382022000000b002009d012a180018003e91"
        "24a04d25a123a21400b012096900003e12e000000000"
    )),
    ("noise_q40", bytes.fromhex(
        "52494646900100005745425056503820840100001009009d012a150013003eed"
        "68a9502422a1a1280d50801d896c009d32847f76833a546036cc73b9e997fa00"
        "74a27f9df3664f02181f8a3a077a903f6002b859c9850a842756a3378539b466"
        "7fa6eaf34000cbf75007c0424519312d6babda2577549142f93d5f9904f5e89f"
        "85523226e1757eafd15c2b4cf9a66cc3d6b15317b9e07c2af65e268463bda43f"
        "e377e52ec415f7df322fbc40a00ffafa6a85764d2bde347e3da107599fc778ca"
        "26ae837fa139adb49ce2e2d4cef7f8c71117cc0b2c4098913b546ae813b6f303"
        "ee68f9f726c560748ea39ff1f711f0d48fdbf354da9d926876260d686b7f64df"
        "674ea46671a7c807738cd47f8bac57bcf4cafe07c986e45ea11e6b7d57d14efe"
        "2af1624fd74aa93ab86d66dd1d673538267cce19a62d089fcacfe5b3dbb9f75a"
        "1f4cc31ca4565adfb0fff019cd5df5e8a6bb025474f9670eeb11d0172a1bfffb"
        "92f4c970a53f6da8229921c0c23cc987b3ebf0f524d55180709ef6864255ac69"
        "bd55ade4d90cd7c6ad7ec9eb5114dbff2ecfc9b498000000"
    )),
    ("mix_seg4", bytes.fromhex(
        "52494646420100005745425056503820360100005008009d012a300020003e9d"
        "369545a5a2a21aaa06005809c4b6004e99423a4bdafe403e41289fd97153e05f"
        "2c01cf89ec20431dfa1727c722853be9c2954e5dc5aae9b1f0728127c15a0000"
        "fe8b9c90032b2c4cd1b7f7bb0ddffd5cfd537794fc4ccf00e29ffd9d0f7ffd39"
        "528979467767bf31876097ff7e2353cd9551d5fe4bdceccbf8b15f724ab89083"
        "4c31b550527202cb72b7eea8fd38f64fc587af0f48104c3df04734d257dcac02"
        "735068b3d7bd7a8728b46ab00ae1b78787fed2e0b5054c702b92fff65b51e782"
        "8a96f6e79f3f70de4d3e1037bfaadf193153480f34789ab578e837ff167e8473"
        "9597071d1179af041c1d1b09d0d7620365efafd7fc7a49e45f80787ff0e0798f"
        "38d5539095d213eff510859a1c1d977eedbb17a9c2fd1bff4b86b78ff8f7fdca"
        "ec3c4b44828d0e000000"
    )),
    ("mix_parts4", bytes.fromhex(
        "52494646400100005745425056503820340100005008009d012a23001d003e8d"
        "3c9747a523a22130155d50a011896c009d328473efc07982525fa1fe00da1129"
        "329038003cac7f5bbe0dc88cc823fc771d7cc1fdf7aa010beb7d3da653a00000"
        "fe50888a0d061e3eb72bea9c5c683fb881c502473a60e005f7f21bef864cbf8f"
        "a3bebcfd1efb7cfd89f50d41819c796fff955e9f8457bcc9aecfa72b27ffb5d9"
        "ff1073a70b3bfccca69ef5b7a795c8983699894f3f8c376158e2b2839ad227be"
        "fe22a4e7e99b5635468b37bb097403a8338de5181b481df216b035b22b198976"
        "bef2bab150ab72c47b3ea8cef4a90324dec71eabe08c7e3fe138c60447e2add9"
        "11aa17a59ce86d3d892a41836eb36fd841de45e97e750a054bfd3af4980adf9a"
        "da05f3ad352c02fdebbbab97f7ff1a430fcfff03bb1f8bf3473022f16f3311ed"
        "cd0ba36bb0000000"
    )),
    ("grad_simplef", bytes.fromhex(
        "524946463c000000574542505650382030000000b202009d012a180010002e69"
        "48a4522123a3a3a380684b480005cd14d40000fefa77df57bba2aec5bdd67ffc"
        "014c0000"
    )),
    ("noise_q90", bytes.fromhex(
        "524946466601000057454250565038205a0100007008009d012a1000100000c0"
        "1225b00274388039e4bf59be003f4aff667d955e209eab32ab4e97f95fdc07bc"
        "7feabf681ec0be44fee9ee01fc53f8dff66fcdce300fd493fd3cea5f6eea5280"
        "00fdee5f53eb19fff91180ca3c8551488705aeebff28e66a588914cae0ab2ba7"
        "b7eeadfe78231c36ad4ffd8057751057f4f9abfe068f8cccba7ed7f3c7b41f87"
        "fbf5829889fe8f7fd36f7d3ad6d9e7d2f706782d5ea5d5f21603e005c4f0a9eb"
        "c91e96657c497feca6ef0fd442a6f11f19a28638b42cb7cb31ef5bf33baffb74"
        "a48bbc7f9bc579cd5296de11e1f4fa7d5f8868d9ab545d8ccf987fff80181e05"
        "1b699a8eef2e18eb95959073f48b00be33e5f90bdc6b345f066305c570c74259"
        "15faaccff26f13e4e04cf12b39e9fdade7a0cd1ff72c1ab82c2cddabad60f9ff"
        "f39385e76bdff2f2ee0ddd7fd250ee295d6c26b4b94eff4693dd56be42b12df3"
        "f98de7fff823f277f2a07d7d0000"
    )),
)
