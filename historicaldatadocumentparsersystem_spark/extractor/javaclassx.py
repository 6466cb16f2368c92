"""Java .class metadata reader — pure Python over the published JVM
class-file format (JVMS §4), Spark-free.

The fourth executable-format family member (after elfx / pex /
machox — whose fat-magic collision with CAFEBABE the machox reader
already dodges): jars in web archives are zips of these, and the
engine's index view is the constant-pool-resolved surface — class /
super / interface names, member census with descriptors, source
file, version — no bytecode decoded.

Covered: every constant-pool tag (Long/Double take TWO slots per
spec — the classic off-by-one), modified-UTF-8 names decoded
leniently, access flags, fields + methods with descriptors, the
SourceFile class attribute. Never raises; junk -> None. All counts
bounds-clamped.
"""

from __future__ import annotations

import struct

_MAGIC = b"\xca\xfe\xba\xbe"

# major version -> marketing Java version (45 = 1.1)
_ACC_CLASS = ((0x0001, "public"), (0x0010, "final"),
              (0x0200, "interface"), (0x0400, "abstract"),
              (0x2000, "annotation"), (0x4000, "enum"),
              (0x8000, "module"))
_ACC_MEMBER = ((0x0001, "public"), (0x0002, "private"),
               (0x0004, "protected"), (0x0008, "static"),
               (0x0010, "final"), (0x0100, "native"),
               (0x0400, "abstract"))


def _flags(v: int, table) -> str:
    return "|".join(name for bit, name in table if v & bit)


def parse_class(payload) -> dict | None:
    """class bytes -> {"major", "minor", "java_version", "access",
    "class_name", "super_name", "interfaces": [...], "source_file",
    "n_cp", "members": [(pos, kind, name, descriptor, access)]} or
    None for junk. Never raises."""
    if not isinstance(payload, (bytes, bytearray)) or \
            len(payload) < 24 or bytes(payload[:4]) != _MAGIC:
        return None
    b = bytes(payload)
    try:
        minor, major, cp_count = struct.unpack_from(">HHH", b, 4)
        if not 1 <= cp_count <= 65535:
            return None
        cp: dict[int, object] = {}
        off = 10
        i = 1
        while i < cp_count:
            tag = b[off]
            off += 1
            if tag == 1:
                (n,) = struct.unpack_from(">H", b, off)
                off += 2
                if off + n > len(b):
                    return None
                cp[i] = b[off:off + n].decode("utf-8", "replace")
                off += n
            elif tag == 7:
                (idx,) = struct.unpack_from(">H", b, off)
                cp[i] = ("class", idx)
                off += 2
            elif tag in (8, 16, 19, 20):
                off += 2
            elif tag in (9, 10, 11, 12, 17, 18):
                off += 4
            elif tag in (3, 4):
                off += 4
            elif tag in (5, 6):
                off += 8
                i += 1          # Long/Double take TWO slots
            elif tag == 15:
                off += 3
            else:
                return None
            i += 1

        def utf8(idx) -> str | None:
            v = cp.get(idx)
            return v if isinstance(v, str) else None

        def cls_name(idx) -> str | None:
            v = cp.get(idx)
            if isinstance(v, tuple) and v[0] == "class":
                s = utf8(v[1])
                return s.replace("/", ".") if s else None
            return None

        access, this_c, super_c, n_if = struct.unpack_from(
            ">HHHH", b, off)
        off += 8
        interfaces = []
        for _ in range(min(n_if, 1000)):
            (ii,) = struct.unpack_from(">H", b, off)
            off += 2
            nm = cls_name(ii)
            if nm:
                interfaces.append(nm)

        members: list[tuple] = []

        def skip_attrs(off: int, collect: dict | None = None
                       ) -> int:
            (n_attr,) = struct.unpack_from(">H", b, off)
            off += 2
            for _ in range(min(n_attr, 1000)):
                name_i, alen = struct.unpack_from(">HI", b, off)
                off += 6
                if alen > len(b):
                    raise ValueError("attr overrun")
                if collect is not None and \
                        utf8(name_i) == "SourceFile" and alen == 2:
                    (sfi,) = struct.unpack_from(">H", b, off)
                    collect["source_file"] = utf8(sfi)
                off += alen
            return off

        for kind in ("field", "method"):
            (n_mem,) = struct.unpack_from(">H", b, off)
            off += 2
            for _ in range(min(n_mem, 10_000)):
                macc, mname, mdesc = struct.unpack_from(
                    ">HHH", b, off)
                off += 6
                members.append((len(members), kind, utf8(mname),
                                utf8(mdesc),
                                _flags(macc, _ACC_MEMBER)))
                off = skip_attrs(off)
        extra: dict = {}
        skip_attrs(off, extra)
        return {
            "major": major, "minor": minor,
            "java_version": (f"Java {major - 44}" if major >= 49
                             else f"JDK 1.{major - 44}"),
            "access": _flags(access, _ACC_CLASS),
            "class_name": cls_name(this_c),
            "super_name": cls_name(super_c),
            "interfaces": interfaces,
            "source_file": extra.get("source_file"),
            "n_cp": cp_count - 1,
            "members": members,
        }
    except (struct.error, ValueError, IndexError):
        return None


# --- encode half (fixtures) --------------------------------------------------

def build_class(class_name: str, super_name: str = "java/lang/Object",
                interfaces: list[str] = (), major: int = 52,
                access: int = 0x0021,
                fields: list[tuple[str, str, int]] = (),
                methods: list[tuple[str, str, int]] = (),
                source_file: str | None = None,
                long_const: bool = False) -> bytes:
    """Minimal valid class file; ``long_const=True`` plants a
    CONSTANT_Long to exercise the two-slot rule."""
    pool: list[bytes] = []
    slots = 0

    def add(entry: bytes, wide: bool = False) -> int:
        nonlocal slots
        pool.append(entry)
        slots += 2 if wide else 1
        return slots - (1 if wide else 0)

    def utf8(s: str) -> int:
        raw = s.encode("utf-8")
        return add(b"\x01" + struct.pack(">H", len(raw)) + raw)

    def clazz(s: str) -> int:
        ni = utf8(s)
        return add(b"\x07" + struct.pack(">H", ni))

    this_i = clazz(class_name)
    super_i = clazz(super_name)
    if_is = [clazz(s) for s in interfaces]
    if long_const:
        add(b"\x05" + struct.pack(">q", 1 << 40), wide=True)
    mem_blobs = {"field": b"", "method": b""}
    counts = {"field": 0, "method": 0}
    for kind, triples in (("field", fields), ("method", methods)):
        for (name, desc, acc) in triples:
            ni, di = utf8(name), utf8(desc)
            mem_blobs[kind] += struct.pack(">HHHH", acc, ni, di, 0)
            counts[kind] += 1
    attrs = b""
    n_attrs = 0
    if source_file:
        sfa_name = utf8("SourceFile")
        sfi = utf8(source_file)
        attrs += struct.pack(">HIH", sfa_name, 2, sfi)
        n_attrs = 1
    out = _MAGIC + struct.pack(">HHH", 0, major, slots + 1)
    out += b"".join(pool)
    out += struct.pack(">HHHH", access, this_i, super_i, len(if_is))
    out += b"".join(struct.pack(">H", i) for i in if_is)
    out += struct.pack(">H", counts["field"]) + mem_blobs["field"]
    out += struct.pack(">H", counts["method"]) + mem_blobs["method"]
    out += struct.pack(">H", n_attrs) + attrs
    return out
