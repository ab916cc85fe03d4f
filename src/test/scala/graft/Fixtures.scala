package graft

/** Shared test fixtures (FIXTURES.md §1): a FeatureCollection covering the
  * parser's edge cases — full feature, 2-element coordinates (no depth),
  * missing/null properties, tsunami-flagged and unflagged rows. */
object Fixtures {
  val featureCollection: String =
    """{"type": "FeatureCollection",
       "features": [
        {"type": "Feature", "id": "us7000abcd",
         "properties": {"mag": 6.1, "place": "100km W of Somewhere", "time": 1389312000000,
                        "updated": 1389315600000, "url": "https://example/ev1", "detail": "https://example/d1",
                        "felt": 12, "cdi": 3.4, "mmi": 4.1, "alert": "green", "status": "reviewed",
                        "tsunami": 1, "sig": 572, "net": "us", "code": "7000abcd",
                        "ids": ",us7000abcd,", "sources": ",us,", "types": ",origin,phase-data,",
                        "nst": 45, "dmin": 0.5, "rms": 0.82, "gap": 76.0,
                        "magType": "mww", "type": "earthquake", "title": "M 6.1 - 100km W of Somewhere"},
         "geometry": {"type": "Point", "coordinates": [-117.12, 36.12, 10.5]}},
        {"type": "Feature", "id": "nc7200wxyz",
         "properties": {"mag": 1.2, "place": null, "time": 1389316000000, "updated": null,
                        "tsunami": 0, "sig": 22, "net": "nc", "code": "7200wxyz",
                        "magType": "md", "type": "quarry blast", "title": "M 1.2"},
         "geometry": {"type": "Point", "coordinates": [-121.5, 37.2]}}
       ]}"""

  /** Documents with planted near-duplicates for dedup tests: (id, text).
    * 1↔2 near-dup (one token changed), 3↔4 exact dup modulo case/space,
    * 5 unrelated, 6↔7 near-dup pair with two tokens changed. */
  val nearDupDocs: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
    Seq(
      1L -> base,
      2L -> base.replace("warm", "cold"),
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      4L -> "Alpha beta  gamma delta epsilon zeta eta theta iota kappa",
      5L -> "completely different content about spark catalyst optimizer rules and tungsten execution engines entirely",
      6L -> (base + " and extra words here"),
      7L -> (base.replace("quick", "slow") + " and extra words here"),
    )
  }
}
