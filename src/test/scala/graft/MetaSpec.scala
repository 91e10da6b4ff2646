package graft

import graft.extract.Meta
import org.scalatest.funsuite.AnyFunSuite

/** Page-metadata kernel contract: head scoping, first-wins, entity
  * decode, rel token lists, case insensitivity, truncation leniency. */
class MetaSpec extends AnyFunSuite {

  private def m(html: String) = Meta.extract(html.getBytes("UTF-8"))

  test("all fields extract from a full head") {
    val pm = m("""<!doctype html><html lang="EN-us"><head>
      |<title>A &amp; B</title>
      |<meta name="description" content="the desc">
      |<meta property="og:title" content="og t">
      |<meta property="og:description" content="og d">
      |<meta property="article:published_time" content="2026-01-02T03:04:05Z">
      |<link rel="canonical" href="https://ex.com/page">
      |</head><body>text</body></html>""".stripMargin)
    assert(pm.title == "A & B")
    assert(pm.description == "the desc")
    assert(pm.ogTitle == "og t")
    assert(pm.ogDescription == "og d")
    assert(pm.canonical == "https://ex.com/page")
    assert(pm.publishedTime == "2026-01-02T03:04:05Z")
    assert(pm.htmlLang == "en-us")
  }

  test("first occurrence wins for every field") {
    val pm = m("<html><head><title>first</title><title>second</title>" +
      "<meta property=\"og:title\" content=\"one\">" +
      "<meta property=\"og:title\" content=\"two\"></head>")
    assert(pm.title == "first")
    assert(pm.ogTitle == "one")
  }

  test("metadata after <body> or </head> is ignored (head scope)") {
    val pm = m("<html><head><title>t</title></head><body>" +
      "<meta property=\"og:title\" content=\"spam\">" +
      "<link rel=\"canonical\" href=\"https://spam\"></body>")
    assert(pm.title == "t")
    assert(pm.ogTitle == "")
    assert(pm.canonical == "")
  }

  test("name/property/rel match case-insensitively; rel is a token list") {
    val pm = m("<head><META NAME=\"Description\" CONTENT=\"d\">" +
      "<link rel=\"alternate canonical\" href=\"https://c\"></head>")
    assert(pm.description == "d")
    assert(pm.canonical == "https://c")
  }

  test("truncated head keeps fields seen before the cut") {
    val pm = m("<head><title>kept</title><meta name=\"descr")
    assert(pm.title == "kept")
    assert(pm.description == "")
  }

  test("title whitespace normalizes; missing fields are empty, never null") {
    val pm = m("<head><title>  a\n\t b  </title></head>")
    assert(pm.title == "a b")
    assert(pm.canonical == "")
    assert(pm.htmlLang == "")
  }

  test("non-HTML payloads yield the empty record") {
    assert(Meta.extract("%PDF-1.4 whatever".getBytes("UTF-8")) == Meta.Empty)
    assert(Meta.extract(Array[Byte]()) == Meta.Empty)
  }
}
