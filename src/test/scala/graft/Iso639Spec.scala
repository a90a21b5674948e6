package graft

import graft.streaming.CounterStore
import org.apache.spark.sql.functions._

class Iso639Spec extends SparkSpec {
  import spark.implicits._

  private def enrich(names: Seq[String], family: String): Map[String, String] =
    CounterStore.enrichLanguages(spark,
      names.map((_, 1L)).toDF("name", "value"), family)
      .select("name", "language")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("every leg of the reference's fallback chain (store.js:29-54)") {
    val got = enrich(Seq(
      "wiki_enwiki",      // 2-letter, ISO-639-1 hit
      "wiki_zzwiki",      // 2-letter, unknown -> code
      "wiki_chrwiki",     // 3-letter, ISO-639-2B hit
      "wiki_dutwiki",     // 3-letter, a B-specific bibliographic code
      "wiki_bclwiki",     // 3-letter, 639-3-only -> second fallback
      "wiki_xyzwiki",     // 3-letter, unknown in both -> code
      "wiki_simplewiki",  // other length -> code
      "wiki_bat_smgwiki"  // other length with underscore -> code
    ), "wiki")
    assert(got("wiki_enwiki") == "English")
    assert(got("wiki_zzwiki") == "zz")
    assert(got("wiki_chrwiki") == "Cherokee")
    assert(got("wiki_dutwiki") == "Dutch")
    assert(got("wiki_bclwiki") == "Central Bikol")
    assert(got("wiki_xyzwiki") == "xyz")
    assert(got("wiki_simplewiki") == "simple")
    assert(got("wiki_bat_smgwiki") == "bat_smg")
  }

  test("wiktionary family strips its own suffix (store.js:66-91)") {
    val got = enrich(Seq("wiki_enwiktionary", "wiki_ndswiktionary"), "wiktionary")
    assert(got("wiki_enwiktionary") == "English")
    assert(got("wiki_ndswiktionary") == "Low German")
  }

  test("suffix strip removes the FIRST occurrence, like JS String.replace") {
    // c0 = "mediawikiwiki": JS 'mediawikiwiki'.replace('wiki','') leaves
    // 'mediawiki' (length != 2,3 -> code itself).
    val got = enrich(Seq("wiki_mediawikiwiki"), "wiki")
    assert(got("wiki_mediawikiwiki") == "mediawiki")
  }
}
