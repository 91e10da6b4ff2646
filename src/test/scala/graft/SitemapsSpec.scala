package graft

import graft.extract.Sitemaps
import org.scalatest.funsuite.AnyFunSuite

/** sitemaps.org protocol parsing through the streaming tokenizer:
  * urlset + sitemapindex forms, entity decoding, CDATA locs, locless
  * entries dropped, truncation leniency. */
class SitemapsSpec extends AnyFunSuite {

  test("urlset: lastmod, entity decode, CDATA, locless entry dropped") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <!-- noise -->
        | <url><loc>https://a.example.com/a</loc><lastmod>2024-01-05</lastmod></url>
        | <url><loc>https://a.example.com/b?x=1&amp;y=2</loc></url>
        | <url><loc><![CDATA[https://a.example.com/c]]></loc><lastmod>2024-02-11</lastmod></url>
        | <url><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    val es = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(es == Seq(
      Sitemaps.Entry("https://a.example.com/a", "2024-01-05"),
      Sitemaps.Entry("https://a.example.com/b?x=1&y=2", ""),
      Sitemaps.Entry("https://a.example.com/c", "2024-02-11")))
  }

  test("sitemapindex form yields child sitemap locs") {
    val xml =
      """<sitemapindex>
        | <sitemap><loc>https://h.example.com/sitemap1.xml.gz</loc>
        |   <lastmod>2024-03-01</lastmod></sitemap>
        | <sitemap><loc>https://h.example.com/sitemap2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val es = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(es.map(_.loc) == Seq("https://h.example.com/sitemap1.xml.gz",
      "https://h.example.com/sitemap2.xml.gz"))
    assert(es.head.lastmod == "2024-03-01")
  }

  test("truncated payload keeps the complete prefix and the open entry") {
    val xml = "<urlset><url><loc>https://t.example.com/x</loc><lastmod>2024-"
    val es = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(es.map(_.loc) == Seq("https://t.example.com/x"))
    // hostile bytes never throw
    assert(Sitemaps.parse(Array[Byte](0, 1, 2, '<', 'l')).isEmpty ||
      Sitemaps.parse(Array[Byte](0, 1, 2, '<', 'l')).nonEmpty)
  }
}
