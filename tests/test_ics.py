"""iCalendar source (RFC 5545): extractor/icsx.py (golden-pinned),
unfolding, content-line parsing, TEXT unescaping, date/duration/RRULE
handling and component isolation."""

import pyarrow.parquet as pq

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import icsx

GOLDEN_ICS = "fixtures/golden_ics_seed42_n30.parquet"
_COLS = ("pos", "uid", "summary", "location", "start_ms", "end_ms",
         "all_day", "tzid", "freq", "rrule_interval", "rrule_count",
         "until_ms", "status")


def _pure_rows(n: int) -> list[tuple]:
    out = []
    for r in fixtures.ics_file_rows(n):
        for ev in icsx.parse_ics(r["payload"]):
            out.append((r["url"],) + tuple(ev[c] for c in _COLS))
    return out


def test_ics_match_committed_golden():
    golden = [(r["url"],) + tuple(r[c] for c in _COLS)
              for r in pq.read_table(GOLDEN_ICS).to_pylist()]
    assert golden == _pure_rows(30)
    assert len(golden) == 35


def test_unfolding_and_content_lines():
    src = "SUMMARY:part one\r\n  indented continues\r\nX:y\n\tz"
    assert icsx.unfold_lines(src) == [
        "SUMMARY:part one indented continues", "X:yz"]
    # quoted params may contain : ; , — the split scans outside quotes
    name, params, value = icsx.parse_content_line(
        'DTSTART;TZID="A;B:C,D";VALUE=DATE:20240101')
    assert name == "DTSTART"
    assert params == {"TZID": "A;B:C,D", "VALUE": "DATE"}
    assert value == "20240101"
    assert icsx.parse_content_line("no colon here") is None
    # unescaping: \n \N \\ \; \, and lenient unknown escapes
    assert icsx.unescape_text(r"a\nb\Nc\\d\;e\,f\qg") \
        == "a\nb\nc\\d;e,fqg"


def test_datetime_duration_and_rrule():
    assert icsx.parse_datetime("20240301T120000Z", {}) \
        == (1709294400000, False)
    assert icsx.parse_datetime("20240301", {}) == (1709251200000, True)
    assert icsx.parse_datetime("20240301T120000", {"VALUE": "DATE"})[1]
    assert icsx.parse_datetime("20241301", {}) is None    # month 13
    assert icsx.parse_datetime("20240230", {}) is None    # Feb 30
    assert icsx.parse_duration("PT1H30M") == 5400
    assert icsx.parse_duration("P2W") == 1209600
    assert icsx.parse_duration("-P1DT1S") == -86401
    assert icsx.parse_duration("P") is None
    assert icsx.parse_duration("P999999999999W") is None  # clamp
    assert icsx.parse_rrule(
        "FREQ=weekly;INTERVAL=2;COUNT=5;X=Y") == ("WEEKLY", 2, 5, None)
    assert icsx.parse_rrule("FREQ=BOGUS;COUNT=3") == (None, 1, 3, None)
    assert icsx.parse_rrule("FREQ=DAILY;UNTIL=20240102") \
        == ("DAILY", 1, None, 1704153600000)
    # interval/count clamp to [1, 1e6]
    assert icsx.parse_rrule("FREQ=DAILY;INTERVAL=99999999")[1] == 1000000
    assert icsx.parse_rrule("FREQ=DAILY;COUNT=0")[2] == 1  # clamp floor


def test_valarm_isolation_and_fallbacks():
    ics = ("BEGIN:VCALENDAR\n"
           "BEGIN:VEVENT\nUID:u1\nDTSTART:20240101T100000Z\n"
           "BEGIN:VALARM\nSUMMARY:alarm text\nACTION:DISPLAY\n"
           "END:VALARM\nSUMMARY:real summary\nEND:VEVENT\n"
           "BEGIN:VEVENT\nSUMMARY:no dtstart -> dropped\nEND:VEVENT\n"
           "BEGIN:VEVENT\nUID:u2\nDTSTART:20240101T100000Z\n"
           "DURATION:PT45M\nEND:VEVENT\n"
           "END:VCALENDAR\n")
    evs = icsx.parse_ics(ics)
    assert [e["uid"] for e in evs] == ["u1", "u2"]
    assert evs[0]["summary"] == "real summary"
    assert evs[0]["end_ms"] == evs[0]["start_ms"]     # no end, no dur
    assert evs[1]["end_ms"] - evs[1]["start_ms"] == 45 * 60000
    assert [e["pos"] for e in evs] == [0, 1]


def test_malformed_never_raises():
    import random
    rng = random.Random("icsx-fuzz")
    for _ in range(200):
        payload = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(400)))
        for ev in icsx.parse_ics(payload):
            assert ev["start_ms"] is not None
    for p in (b"", b"BEGIN:VEVENT", b"END:VEVENT\nEND:VEVENT", None,
              b"BEGIN:VCALENDAR\nEND:VCALENDAR"):
        assert icsx.parse_ics(p) == []
