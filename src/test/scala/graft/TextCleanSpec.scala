package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextClean

class TextCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextClean.cleanAll(col("t")).as("c"))
      .as[String].head()

  test("stripHtml removes tags and collapses the gap") {
    assert(clean("before <b>bold</b> after") == "before bold after")
    assert(clean("<div class=\"x\">inner</div>") == "inner")
  }

  test("emails are masked, including dotted and plus-tagged locals") {
    assert(clean("mail me at first.last+tag@sub.example.co today")
      == "mail me at <EMAIL> today")
  }

  test("urls are masked before emails (userinfo @ stays one URL)") {
    assert(clean("see https://user@example.com/a?b=c#d for info")
      == "see <URL> for info")
  }

  test("phone shapes masked; bare long digit runs are NOT (precision rule)") {
    assert(clean("call 555-867-5309 now") == "call <PHONE> now")
    assert(clean("call 555.867.5309 now") == "call <PHONE> now")
    // conservative by design: ids/timestamps survive
    assert(clean("order 1234567890 shipped") == "order 1234567890 shipped")
  }

  test("cleanAll composes on a document mixing all four") {
    val doc = "<p>Contact a@b.io via https://x.io/p or 123-456-7890</p>"
    assert(clean(doc) == "Contact <EMAIL> via <URL> or <PHONE>")
  }

  test("raw SOH in the input cannot fabricate a redaction marker") {
    // crawl text containing a literal SOH-wrapped placeholder word would
    // collide with the idempotence shield and be "restored" to <URL>;
    // the input-side SOH strip prevents the fabrication
    val soh = 1.toChar
    val doc = s"see ${soh}URL${soh} and normal words here"
    assert(clean(doc) == "see URL and normal words here")
    // genuine placeholders still survive a second pass untouched
    assert(clean(clean(doc)) == clean(doc))
  }

  test("quality filter fires each rule on a targeted fixture") {
    val fixtures = Seq(
      (1L, "a good plain sentence with enough simple words to pass every rule fine"),
      (2L, "too short"), // < 5 tokens
      (3L, "1029 3847 5566 7788 9900 1122 3344"), // digit-heavy (+low score)
      (4L, "!!! ??? ... ;;; ::: --- !!! ??? whoa !!!"), // punct-heavy (+low score)
      (5L, "") // empty: too_short + low_quality
    ).toDF("id", "text")
    val (keep, reasons) = TextClean.qualityFilterFlags(col("text"))
    val out = fixtures.select(col("id"), keep.as("k"), reasons.as("r"))
      .as[(Long, Boolean, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (true, ""))
    assert(!out(2L)._1 && out(2L)._2.contains("too_short"))
    assert(!out(3L)._1 && out(3L)._2.contains("digit_heavy"))
    assert(!out(4L)._1 && out(4L)._2.contains("punct_heavy"))
    assert(!out(5L)._1 && out(5L)._2.contains("too_short"))
    // reasons csv is alphabetically ordered by construction
    val multi = out(4L)._2.split(",").toSeq
    assert(multi == multi.sorted)
  }
}
