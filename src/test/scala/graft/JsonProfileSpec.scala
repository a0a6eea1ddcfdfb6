package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.JsonProfile

class JsonProfileSpec extends AnyFunSuite with SparkTestSupport {

  test("keyTypes: per-key type counts; malformed and non-object lines drop") {
    val s = spark
    import s.implicits._
    val got = JsonProfile.keyTypes(s, Seq(
        (1L, """{"a":1,"b":"x","tags":[1,2]}"""),
        (2L, """{"a":2.5,"b":"y","meta":{"k":1}}"""),
        (3L, """{"a":"drifted","c":true,"d":null}"""),
        (4L, """{broken"""),
        (5L, """[1,2,3]"""), // valid JSON but not an object
        (6L, """"just a string""""))
      .toDF("doc_id", "json")).collect()
      .map(k => (k.key, k.jtype) -> k.n).toMap
    assert(got == Map(
      ("a", "number") -> 2L, ("a", "string") -> 1L,
      ("b", "string") -> 2L, ("tags", "array") -> 1L,
      ("meta", "object") -> 1L, ("c", "boolean") -> 1L,
      ("d", "null") -> 1L))
  }

  test("drift: only multi-typed keys surface, types sorted with counts") {
    val s = spark
    import s.implicits._
    val got = JsonProfile.drift(s, Seq(
        (1L, """{"a":1,"b":"x"}"""),
        (2L, """{"a":"one","b":"y"}"""),
        (3L, """{"a":null,"b":"z"}"""))
      .toDF("doc_id", "json")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getLong(1) == 3L)
    assert(r.getString(2) == "null:1,number:1,string:1")
  }
}
