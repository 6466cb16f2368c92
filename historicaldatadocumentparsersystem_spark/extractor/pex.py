"""PE/COFF executable reader — pure Python, from scratch over the
published PE format layout, Spark-free.

The Windows third of the executable triad (``elfx`` = ELF,
``machox`` = Mach-O): DLL/EXE payloads inside crawled installers
and app bundles get the same index-shaped view — machine/
characteristics from the COFF header, PE32 vs PE32+ from the
optional-header magic, the section table, and imported DLL names
resolved by walking the import directory with a from-scratch
RVA-to-file-offset mapping over the section extents (nothing is
loaded or relocated).

A malformed table keeps whatever parsed; junk yields kind None.
"""

from __future__ import annotations

_MACHINES = {0x014C: "x86", 0x0200: "ia64", 0x8664: "x86_64",
             0x01C0: "arm", 0xAA64: "arm64", 0x5064: "riscv64"}


def parse_pe(payload) -> dict:
    """payload -> {"machine": str|None, "kind": 'pe32'|'pe32+'|
    None, "is_dll": bool|None, "n_sections": int|None,
    "timestamp": int|None, "sections": [(pos, name, vsize, rva,
    rawsize, rawoff, flags)], "imports": [str]}; never raises."""
    out: dict = {"machine": None, "kind": None, "is_dll": None,
                 "n_sections": None, "timestamp": None,
                 "sections": [], "imports": []}
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 0x40 or payload[:2] != b"MZ":
        return out
    b = bytes(payload)

    def u16(o):
        return int.from_bytes(b[o:o + 2], "little")

    def u32(o):
        return int.from_bytes(b[o:o + 4], "little")

    try:
        pe = u32(0x3C)
        if pe + 24 > len(b) or b[pe:pe + 4] != b"PE\x00\x00":
            return out
        coff = pe + 4
        out["machine"] = _MACHINES.get(u16(coff),
                                       hex(u16(coff)))
        nsec = u16(coff + 2)
        out["n_sections"] = nsec
        out["timestamp"] = u32(coff + 4)
        chars = u16(coff + 18)
        out["is_dll"] = bool(chars & 0x2000)
        opt_size = u16(coff + 16)
        opt = coff + 20
        magic = u16(opt) if opt_size >= 2 else 0
        plus = magic == 0x20B
        if magic == 0x10B:
            out["kind"] = "pe32"
        elif plus:
            out["kind"] = "pe32+"
        # data directory: entry 1 = import table
        dd_off = opt + (112 if plus else 96)
        import_rva = import_size = 0
        if magic in (0x10B, 0x20B) and \
                dd_off + 16 <= opt + opt_size:
            import_rva = u32(dd_off + 8)
            import_size = u32(dd_off + 12)
        sec_table = opt + opt_size
        extents = []
        for i in range(min(nsec, 96)):
            p = sec_table + 40 * i
            if p + 40 > len(b):
                break
            name = b[p:p + 8].rstrip(b"\x00").decode(
                "latin-1")
            vsize, rva = u32(p + 8), u32(p + 12)
            rawsize, rawoff = u32(p + 16), u32(p + 20)
            fl = u32(p + 36)
            flags = "".join(
                ch for ch, bit in (("X", 0x20000000),
                                   ("R", 0x40000000),
                                   ("W", 0x80000000)) if fl & bit)
            out["sections"].append(
                (i, name, vsize, rva, rawsize, rawoff, flags))
            extents.append((rva, max(vsize, rawsize), rawoff,
                            rawsize))

        def rva2off(rva: int) -> int | None:
            for srva, span, roff, rsize in extents:
                if srva <= rva < srva + span:
                    d = rva - srva
                    if d < rsize:
                        return roff + d
            return None

        def cstr(off: int) -> str | None:
            if off is None or off >= len(b):
                return None
            end = b.find(b"\x00", off, off + 256)
            if end < 0:
                return None
            s = b[off:end].decode("latin-1")
            return s if s else None

        if import_rva and import_size:
            for i in range(min(import_size // 20, 200)):
                p = rva2off(import_rva + 20 * i)
                if p is None or p + 20 > len(b):
                    break
                name_rva = u32(p + 12)
                if u32(p) == 0 and name_rva == 0:
                    break  # null terminator entry
                nm = cstr(rva2off(name_rva))
                if nm:
                    out["imports"].append(nm)
    except (ValueError, IndexError):
        pass
    return out
