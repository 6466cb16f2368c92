"""UA classification: rule-order vectors, Spark==pure parity on
samples + golden UAs + adversarial strings."""

import random

from historicaldatadocumentparsersystem_spark import fixtures
from historicaldatadocumentparsersystem_spark.extractor import uax


def test_rule_order_vectors():
    c = uax.classify
    # Edge carries Chrome/ and Safari/ — edge must win
    assert c(fixtures.UA_SAMPLES[3])[:3] == ("edge", 124, "windows")
    assert c(fixtures.UA_SAMPLES[4])[0] == "edge"          # legacy
    assert c(fixtures.UA_SAMPLES[5])[:3] == ("edge", 124, "ios")
    # Opera (OPR + old Presto Version/12)
    assert c(fixtures.UA_SAMPLES[6])[:2] == ("opera", 109)
    assert c(fixtures.UA_SAMPLES[7])[:2] == ("opera", 12)
    # Samsung carries Chrome/
    assert c(fixtures.UA_SAMPLES[8])[:3] == (
        "samsung", 24, "android")
    # Seamonkey exclusion: not firefox, and no later rule matches
    assert c(fixtures.UA_SAMPLES[12])[0] is None
    # Safari needs Version/; Chrome-on-iOS is chrome, not safari
    assert c(fixtures.UA_SAMPLES[13])[:3] == ("safari", 17, "macos")
    assert c(fixtures.UA_SAMPLES[14])[:3] == ("safari", 16, "ios")
    assert c(fixtures.UA_SAMPLES[15])[:3] == ("chrome", 124, "ios")
    # IE both generations
    assert c(fixtures.UA_SAMPLES[16])[:2] == ("ie", 9)
    assert c(fixtures.UA_SAMPLES[17])[:2] == ("ie", 11)
    # bots: named + nameless markers
    assert c(fixtures.UA_SAMPLES[18])[3:] == (True, "googlebot")
    assert c(fixtures.UA_SAMPLES[23])[3:] == (True, "slurp")
    assert c("curl/8.5.0") == (None, None, None, True, None)
    assert c(fixtures.UA_SAMPLES[0])[3] is False
    # null propagates
    assert c(None) == (None,) * 5
    # android UA carries Linux; ios carries "like Mac OS X"
    assert c(fixtures.UA_SAMPLES[2])[2] == "android"
    assert c(fixtures.UA_SAMPLES[11])[2] == "ios"
    # version digits are bounded at 9 in every engine
    assert c("Chrome/12345678901 Safari/1")[:2] == (
        "chrome", 123456789)


def _adversarial() -> list:
    rng = random.Random(21)
    out = ["OPR/Version/12", "Edg/", "Edge/x", "MSIE abc rv:7",
           "Version/9 Safari", "Safari/600 Version/",
           "Chrome/0000000000009 Safari/1", "BOT", "Bot/1",
           "xXxSpIdErXx", "Trident/7.0", "rv:11.0 Trident/7.0",
           "Firefox/1 Seamonkey/2 Chrome/3 Safari/4 Version/5"]
    tokens = ["Chrome/", "Edg/", "OPR/", "Version/", "Safari/",
              "Firefox/", "MSIE ", "rv:", "bot", "spider",
              "Windows NT", "Android", "Linux", "iPhone",
              "Mac OS X", "12", "999999999999", "/", " ", "(", ")"]
    for _ in range(150):
        out.append("".join(rng.choice(tokens)
                           for _ in range(rng.randrange(1, 8))))
    return out


def test_spark_matches_pure(spark):
    from historicaldatadocumentparsersystem_spark.extractor import \
        accesslogx
    from historicaldatadocumentparsersystem_spark.operators import \
        uaclass
    uas = list(fixtures.UA_SAMPLES) + _adversarial()
    for r in fixtures.accesslog_file_rows(12):
        for row in accesslogx.parse_access_log(r["payload"])["rows"]:
            uas.append(row[12])
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(uas)],
        "pos int, user_agent string").repartition(8)
    got = {r["pos"]: (r["family"], r["version_major"], r["os"],
                      r["is_bot"], r["bot_name"])
           for r in uaclass.classify_ua(df).collect()}
    for i, u in enumerate(uas):
        assert got[i] == uax.classify(u), (i, u)
