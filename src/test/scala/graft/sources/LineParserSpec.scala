package graft.sources

import graft.SparkSpec

class LineParserSpec extends SparkSpec {
  import spark.implicits._

  test("splitCsvLine handles quoted delimiters and doubled quotes") {
    assert(LineParser.splitCsvLine("a,\"b,c\",d", ',', '"') == Seq("a", "b,c", "d"))
    assert(LineParser.splitCsvLine("\"He said \"\"hi\"\"\",x", ',', '"') ==
      Seq("He said \"hi\"", "x"))
    assert(LineParser.splitCsvLine("a,,c", ',', '"') == Seq("a", "", "c"))
  }

  test("headLine/dataStart/endLine select the right rows") {
    val lines = Seq("junk", "a,b", "1,2", "3,4", "5,6").toDS()
    val out = LineParser.parseLines(lines,
      LineParserConfig(headLine = 2, dataStart = 3, endLine = Some(4)))
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.orderBy("a").as[(String, String)].collect().toSeq ==
      Seq(("1", "2"), ("3", "4")))
  }

  test("no header: explicit columns") {
    val lines = Seq("1,2", "3,4").toDS()
    val out = LineParser.parseLines(lines,
      LineParserConfig(headLine = 0, dataStart = 1, columns = Seq("x", "y")))
    assert(out.count() == 2 && out.columns.toSeq == Seq("x", "y"))
  }

  test("dataLines list admits listed rows, the >= max tail, and skips the gap") {
    val lines = Seq("a,b", "skip,skip", "1,2", "junk,junk", "3,4", "5,6").toDS()
    val out = LineParser.parseLines(lines,
      LineParserConfig(headLine = 1, dataLines = Seq(3, 5)))
    // row 3 listed, row 4 in the gap, rows 5-6 >= max(dataLines)
    assert(out.orderBy("a").as[(String, String)].collect().toSeq ==
      Seq(("1", "2"), ("3", "4"), ("5", "6")))
  }

  test("dataLines never admits the header or field rows") {
    val lines = Seq("a,b", "1,2").toDS()
    val out = LineParser.parseLines(lines,
      LineParserConfig(headLine = 1, dataLines = Seq(1, 2)))
    assert(out.as[(String, String)].collect().toSeq == Seq(("1", "2")))
  }

  test("fieldLine splices shared values as leading columns of every row") {
    val lines = Seq("2024,eu", "a,b", "1,2").toDS()
    val out = LineParser.parseLines(lines, LineParserConfig(
      headLine = 2, dataStart = 3,
      fieldLine = Some(1), fieldNames = Seq("year", "zone")))
    assert(out.columns.toSeq == Seq("year", "zone", "a", "b"))
    assert(out.as[(String, String, String, String)].collect().toSeq ==
      Seq(("2024", "eu", "1", "2")))
  }

  test("quoted field containing the delimiter parses as one cell (RFC 4180)") {
    val lines = Seq("name,addr", "Alice,\"1 Main St, Springfield\"").toDS()
    val out = LineParser.parseLines(lines, LineParserConfig())
    assert(out.as[(String, String)].collect().toSeq ==
      Seq(("Alice", "1 Main St, Springfield")))
  }

  test("custom delimiter") {
    val lines = Seq("a|b", "1|2").toDS()
    val out = LineParser.parseLines(lines, LineParserConfig(delimiter = "|"))
    assert(out.as[(String, String)].collect().toSeq == Seq(("1", "2")))
  }
}
