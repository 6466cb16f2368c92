"""ELF object reader — pure Python, from scratch over the published
System V gABI layout, Spark-free.

Crawled app bundles and firmware zips are full of shared objects;
the engine's view is INDEX-SHAPED, like ``fontx``/``wasmx``: the
identity header (class/endianness/type/machine), the section-header
table with names resolved through ``.shstrtab``, and the dynamic
section's DT_NEEDED entries resolved through the string table its
``sh_link`` names — the ldd-style dependency surface, without
executing or relocating anything.

Both ELF32 and ELF64, both byte orders, from one parameterized
layout table. A malformed table keeps whatever parsed (the corpus
needs to see truncated binaries, not lose them).
"""

from __future__ import annotations

_MACHINES = {3: "x86", 8: "mips", 20: "ppc", 40: "arm",
             62: "x86_64", 183: "aarch64", 243: "riscv"}
_TYPES = {1: "rel", 2: "exec", 3: "dyn", 4: "core"}
_SEC_TYPES = {0: "null", 1: "progbits", 2: "symtab", 3: "strtab",
              4: "rela", 5: "hash", 6: "dynamic", 7: "note",
              8: "nobits", 9: "rel", 11: "dynsym",
              14: "init_array", 15: "fini_array",
              0x6FFFFFF6: "gnu_hash", 0x6FFFFFFE: "verneed",
              0x6FFFFFFF: "versym"}


def parse_elf(payload) -> dict:
    """payload -> {"cls": 32|64|None, "endian": 'le'|'be'|None,
    "etype", "machine", "entry", "sections": [(pos, name, stype,
    flags, offset, size)], "needed": [str]}; never raises; cls
    None for junk. flags is a compact 'WAX' subset string."""
    out: dict = {"cls": None, "endian": None, "etype": None,
                 "machine": None, "entry": None, "sections": [],
                 "needed": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 52 or payload[:4] != b"\x7fELF":
        return out
    b = bytes(payload)
    if b[4] not in (1, 2) or b[5] not in (1, 2):
        return out
    is64 = b[4] == 2
    bo = "little" if b[5] == 1 else "big"
    out["cls"] = 64 if is64 else 32
    out["endian"] = "le" if bo == "little" else "be"

    def u(off: int, n: int) -> int:
        return int.from_bytes(b[off:off + n], bo)

    w = 8 if is64 else 4  # word size

    def i64(v: int) -> int | None:
        # Int64-column clamp rule: u64 header fields (kernel-space
        # entry points are REAL at >= 2^63) surface NULL rather
        # than crashing the Arrow batch
        return v if v < 1 << 63 else None

    out["etype"] = _TYPES.get(u(16, 2), str(u(16, 2)))
    out["machine"] = _MACHINES.get(u(18, 2), str(u(18, 2)))
    out["entry"] = i64(u(24, w))
    shoff = u(24 + w + w, w)
    # e_shentsize/e_shnum/e_shstrndx trail the fixed header
    tail = 24 + 3 * w + 4 + 2 + 2 + 2  # after e_phnum
    shentsize = u(tail, 2)
    shnum = u(tail + 2, 2)
    shstrndx = u(tail + 4, 2)
    if shoff == 0 or shentsize < (64 if is64 else 40):
        return out

    def sec_raw(i: int) -> tuple | None:
        p = shoff + i * shentsize
        if p + shentsize > len(b):
            return None
        if is64:
            return (u(p, 4), u(p + 4, 4), u(p + 8, 8),
                    u(p + 24, 8), u(p + 32, 8), u(p + 40, 4))
        return (u(p, 4), u(p + 4, 4), u(p + 8, 4),
                u(p + 16, 4), u(p + 20, 4), u(p + 24, 4))
        # (name_off, type, flags, offset, size, link)

    def strz(base: int, off: int, limit: int) -> str:
        p = base + off
        if p >= len(b) or p >= base + limit:
            return ""
        end = b.find(b"\x00", p, min(len(b), base + limit))
        if end < 0:
            end = min(len(b), base + limit)
        return b[p:end].decode("latin-1")

    shstr = sec_raw(shstrndx) if shstrndx < shnum else None
    raws = []
    for i in range(min(shnum, 500)):
        r = sec_raw(i)
        if r is None:
            break
        raws.append(r)
        name = strz(shstr[3], r[0], shstr[4]) if shstr else ""
        fl = r[2]
        flags = "".join(ch for ch, bit in
                        (("W", 1), ("A", 2), ("X", 4)) if fl & bit)
        out["sections"].append(
            (i, name, _SEC_TYPES.get(r[1], str(r[1])), flags,
             i64(r[3]), i64(r[4])))
    # DT_NEEDED through the dynamic section's own string table
    for i, r in enumerate(raws):
        if r[1] != 6:  # SHT_DYNAMIC
            continue
        strtab = raws[r[5]] if r[5] < len(raws) else None
        if strtab is None:
            continue
        ent = 16 if is64 else 8
        p = r[3]
        end = min(len(b), r[3] + r[4])
        while p + ent <= end:
            tag = u(p, w)
            val = u(p + w, w)
            if tag == 0:  # DT_NULL
                break
            if tag == 1:  # DT_NEEDED
                nm = strz(strtab[3], val, strtab[4])
                if nm:
                    out["needed"].append(nm)
            p += ent
    return out
