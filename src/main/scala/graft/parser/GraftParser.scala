package graft.parser

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.commands._
import graft.model._

/** Hand-written recursive-descent parser for the graft DDL dialect
  * (SURVEY.md §7.1 step 2 — the dialect is 14 line-oriented statements;
  * reference grammar: spark/spark-common/src/main/antlr/LightningParser.g4).
  * Raw statement tails (`AS <query>`, `DDL <ddls>`) are captured verbatim
  * from the original text via token offsets.
  */
object GraftParser {

  /** Normalized-prefix sniffing: is this statement ours or Spark's?
    * (reference: parser/LightningExtendedParser.scala:134-186)
    */
  def isGraftStatement(sql: String): Boolean = {
    val s = stripLeadingComments(sql).toUpperCase.replaceAll("\\s+", " ").trim
    s.startsWith("REGISTER ") ||
      s.startsWith("COMPILE USL") ||
      s.startsWith("ACTIVATE USL") ||
      s.startsWith("LOAD USL") ||
      s.startsWith("UPDATE USL") ||
      s.startsWith("REMOVE USL") ||
      s.startsWith("LIST DQ") ||
      s.startsWith("RUN DQ") ||
      s.startsWith("REMOVE DQ") ||
      s.startsWith("SHOW DQ") ||
      s.startsWith("SHOW NAMESPACES OR TABLES") ||
      s.startsWith("SHOW LAKE HISTORY") ||
      s.startsWith("OPTIMIZE LAKE ") ||
      s.startsWith("VACUUM LAKE ") ||
      s.startsWith("CONVERT TO ") ||
      s.startsWith("CHECKPOINT LAKE ") ||
      s.startsWith("RESTORE LAKE ")
  }

  private def stripLeadingComments(sql: String): String = {
    var s = sql
    var changed = true
    while (changed) {
      changed = false
      val t = s.dropWhile(_.isWhitespace)
      if (t.startsWith("--")) { s = t.dropWhile(_ != '\n'); changed = true }
      else if (t.startsWith("/*")) {
        val e = t.indexOf("*/")
        s = if (e < 0) "" else t.substring(e + 2); changed = true
      } else s = t
    }
    s
  }

  def parse(sql: String): LogicalPlan = new StatementParser(sql).parseStatement()

  /** Parse the CREATE TABLE statements inside a COMPILE USL DDL tail.
    * Statements split on top-level `;` (reference splits on `";.*?\n"`,
    * CompileUSLSpec.scala:74).
    */
  def parseDdlTables(ddl: String): Seq[TableSpec] =
    splitStatements(ddl).map(s => new StatementParser(s).parseCreateTable())

  def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var depth = 0
    var quote: Char = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ';' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}

private[parser] final class StatementParser(original: String) {
  private val tokens = Lexer.tokenize(original)
  private var pos = 0

  private def cur: Token = tokens(pos)
  private def advance(): Token = { val t = cur; pos += 1; t }

  private def isKw(t: Token, kw: String): Boolean = t match {
    case Ident(text, _, false) => text.equalsIgnoreCase(kw)
    case _ => false
  }
  private def peekKw(kw: String): Boolean = isKw(cur, kw)
  private def acceptKw(kw: String): Boolean = if (peekKw(kw)) { pos += 1; true } else false
  private def expectKw(kw: String): Unit =
    if (!acceptKw(kw)) fail(s"expected keyword $kw")
  private def acceptSym(c: Char): Boolean = cur match {
    case Sym(`c`, _) => pos += 1; true
    case _ => false
  }
  private def expectSym(c: Char): Unit = if (!acceptSym(c)) fail(s"expected '$c'")

  private def fail(msg: String): Nothing =
    throw new ParseException(s"$msg at '${cur.text}' (offset ${cur.start}) in: ${original.take(200)}")

  private def ident(): String = cur match {
    case Ident(text, _, _) => pos += 1; text
    case _ => fail("expected identifier")
  }

  private def qualified(): Seq[String] = {
    val parts = Seq.newBuilder[String]
    parts += ident()
    while (acceptSym('.')) parts += ident()
    parts.result()
  }

  private def strLit(): String = cur match {
    case StrLit(text, _) => pos += 1; text
    case _ => fail("expected string literal")
  }

  private def intLit(): Int = cur match {
    case NumLit(text, _) => pos += 1; text.toInt
    case _ => fail("expected integer literal")
  }

  /** 64-bit integer literal (Iceberg snapshot ids exceed Int). */
  private def longLit(): Long = cur match {
    case NumLit(text, _) => pos += 1; text.toLong
    case _ => fail("expected integer literal")
  }

  /** Everything after the current token's start, verbatim. */
  private def restOfInput(): String = original.substring(cur.start).trim

  // ---- statements ----

  def parseStatement(): LogicalPlan = {
    if (peekKw("REGISTER")) parseRegister()
    else if (peekKw("COMPILE")) parseCompileUsl()
    else if (peekKw("ACTIVATE")) parseActivate()
    else if (peekKw("LOAD")) parseLoadUsl()
    else if (peekKw("UPDATE")) parseUpdateUsl()
    else if (peekKw("REMOVE")) parseRemove()
    else if (peekKw("LIST")) parseListDq()
    else if (peekKw("RUN")) parseRunDq()
    else if (peekKw("SHOW")) parseShow()
    else if (peekKw("OPTIMIZE")) parseOptimizeLake()
    else if (peekKw("VACUUM")) parseVacuumLake()
    else if (peekKw("CONVERT")) parseConvert()
    else if (peekKw("CHECKPOINT")) {
      expectKw("CHECKPOINT"); expectKw("LAKE"); expectKw("TABLE")
      val t = qualified()
      // CHECKPOINT LAKE TABLE fqn [V2]: V2 writes the UUID-named
      // manifest + sidecar form instead of a classic checkpoint
      graft.plans.CheckpointLakeTableCommand(t, acceptKw("V2"))
    }
    else if (peekKw("RESTORE")) {
      // RESTORE LAKE TABLE fqn TO VERSION n (Delta: commit version;
      // Iceberg: snapshot id — what SHOW LAKE HISTORY lists)
      //   | TO TIMESTAMP 'ts' (latest state at-or-before the timestamp)
      expectKw("RESTORE"); expectKw("LAKE"); expectKw("TABLE")
      val t = qualified()
      expectKw("TO")
      if (acceptKw("TIMESTAMP"))
        graft.plans.RestoreLakeTableCommand(t, None, Some(strLit()))
      else {
        expectKw("VERSION")
        graft.plans.RestoreLakeTableCommand(t, Some(longLit()))
      }
    }
    else fail("unknown graft statement")
  }

  /** CONVERT TO DELTA|ICEBERG '<parquet dir>' — in-place registration. */
  private def parseConvert(): LogicalPlan = {
    expectKw("CONVERT"); expectKw("TO")
    val fmt = ident().toUpperCase
    graft.plans.ConvertToLakeCommand(strLit(), fmt)
  }

  private def parseRegister(): LogicalPlan = {
    expectKw("REGISTER")
    val replace = if (acceptKw("OR")) { expectKw("REPLACE"); true } else false
    if (acceptKw("CATALOG")) {
      val name = ident()
      expectKw("SOURCE")
      val source = qualified()
      val pattern = if (acceptKw("NAME")) { expectKw("LIKE"); Some(strLit()) } else None
      expectKw("NAMESPACE")
      val ns = qualified()
      RegisterCatalogCommand(name, source, pattern, ns, replace)
    } else if (acceptKw("DQ")) {
      val name = ident()
      expectKw("TABLE")
      val table = qualified()
      expectKw("AS")
      RegisterDqCommand(name, table, restOfInput())
    } else {
      val typ = ident()
      expectKw("DATASOURCE")
      val name = ident()
      val opts = if (acceptKw("OPTIONS")) parseOptions() else Map.empty[String, String]
      expectKw("NAMESPACE")
      val ns = qualified()
      val tags = if (acceptKw("TAG")) parseTagColumns() else Nil
      RegisterDataSourceCommand(DataSourceSpec(name, typ.toUpperCase, ns, opts, tags, replace))
    }
  }

  private def parseOptions(): Map[String, String] = {
    expectSym('(')
    val opts = Map.newBuilder[String, String]
    var first = true
    while (!acceptSym(')')) {
      if (!first) expectSym(',')
      first = false
      val k = ident()
      val v = cur match {
        case StrLit(text, _) => pos += 1; text
        case NumLit(text, _) => pos += 1; text
        case Ident(text, _, _) => pos += 1; text
        case _ => fail("expected option value")
      }
      opts += (k -> v)
    }
    opts.result()
  }

  private def parseTagColumns(): Seq[TagField] = {
    expectSym('(')
    val tags = Seq.newBuilder[TagField]
    var first = true
    while (!acceptSym(')')) {
      if (!first) expectSym(',')
      first = false
      tags += TagField(ident(), parseDataTypeString())
    }
    tags.result()
  }

  private def parseCompileUsl(): LogicalPlan = {
    expectKw("COMPILE")
    expectKw("USL")
    val ifNotExists = if (acceptKw("IF")) { expectKw("NOT"); expectKw("EXISTS"); true } else false
    val name = ident()
    val deploy = acceptKw("DEPLOY")
    expectKw("NAMESPACE")
    val ns = qualified()
    expectKw("DDL")
    CompileUslCommand(name, ifNotExists, deploy, ns, restOfInput())
  }

  private def parseActivate(): LogicalPlan = {
    expectKw("ACTIVATE")
    expectKw("USL")
    expectKw("TABLE")
    val table = qualified()
    expectKw("AS")
    ActivateUslTableCommand(table, restOfInput())
  }

  private def parseLoadUsl(): LogicalPlan = {
    expectKw("LOAD"); expectKw("USL")
    val name = ident()
    expectKw("NAMESPACE")
    LoadUslCommand(name, qualified())
  }

  private def parseUpdateUsl(): LogicalPlan = {
    expectKw("UPDATE"); expectKw("USL")
    val name = ident()
    expectKw("NAMESPACE")
    val ns = qualified()
    expectKw("AS")
    UpdateUslCommand(name, ns, restOfInput())
  }

  private def parseRemove(): LogicalPlan = {
    expectKw("REMOVE")
    if (acceptKw("USL")) {
      val name = ident()
      expectKw("NAMESPACE")
      RemoveUslCommand(name, qualified())
    } else {
      expectKw("DQ")
      val name = ident()
      expectKw("TABLE")
      RemoveDqCommand(name, qualified())
    }
  }

  /** OPTIMIZE LAKE TABLE fqn [SMALLER THAN bytes] [TARGET n FILES]
    * [ZORDER BY (c1, c2, ...)] — bin-pack small files of a native lake
    * table (all files when ZORDER rewrites the clustering).
    */
  private def parseOptimizeLake(): LogicalPlan = {
    expectKw("OPTIMIZE"); expectKw("LAKE"); expectKw("TABLE")
    val table = qualified()
    var smallerThan: Option[Long] = None
    var targetFiles: Option[Int] = None
    var zorder: Seq[String] = Nil
    var progressed = true
    while (progressed) {
      progressed = false
      if (acceptKw("SMALLER")) {
        expectKw("THAN"); smallerThan = Some(intLit().toLong); progressed = true
      } else if (acceptKw("TARGET")) {
        targetFiles = Some(intLit()); expectKw("FILES"); progressed = true
      } else if (acceptKw("ZORDER")) {
        expectKw("BY"); expectSym('(')
        val cols = Seq.newBuilder[String]
        cols += ident()
        while (acceptSym(',')) cols += ident()
        expectSym(')')
        zorder = cols.result(); progressed = true
      }
    }
    graft.plans.OptimizeLakeTableCommand(table, smallerThan, targetFiles, zorder)
  }

  /** VACUUM LAKE TABLE fqn [RETAIN n VERSIONS] — delete files no retained
    * version references (Delta) / expire snapshots + orphan files
    * (Iceberg). Default retains only the current version.
    */
  private def parseVacuumLake(): LogicalPlan = {
    expectKw("VACUUM"); expectKw("LAKE"); expectKw("TABLE")
    val table = qualified()
    // RETAIN n VERSIONS (count-based) | RETAIN n HOURS (age-based,
    // delta-spark's public form; Iceberg expire_snapshots older_than)
    if (acceptKw("RETAIN")) {
      val n = intLit()
      if (acceptKw("HOURS"))
        graft.plans.VacuumLakeTableCommand(table, 1, retainHours = Some(n))
      else { expectKw("VERSIONS"); graft.plans.VacuumLakeTableCommand(table, n) }
    } else graft.plans.VacuumLakeTableCommand(table, 1)
  }

  private def parseListDq(): LogicalPlan = {
    expectKw("LIST"); expectKw("DQ"); expectKw("USL")
    ListDqCommand(qualified())
  }

  private def parseRunDq(): LogicalPlan = {
    expectKw("RUN"); expectKw("DQ")
    val name = if (!peekKw("TABLE")) Some(ident()) else None
    expectKw("TABLE")
    RunDqCommand(name, qualified())
  }

  private def parseShow(): LogicalPlan = {
    expectKw("SHOW")
    if (acceptKw("DQ")) {
      val valid =
        if (acceptKw("VALID")) true
        else if (acceptKw("INVALID")) false
        else fail("expected VALID or INVALID")
      if (!acceptKw("RECORD")) expectKw("RECORDS")
      val name = ident()
      expectKw("TABLE")
      val table = qualified()
      val limit = if (acceptKw("LIMIT")) intLit() else 0
      ShowDqRecordsCommand(name, table, valid, limit)
    } else if (acceptKw("LAKE")) {
      expectKw("HISTORY")
      graft.plans.ShowLakeHistoryCommand(qualified())
    } else {
      expectKw("NAMESPACES"); expectKw("OR"); expectKw("TABLES"); expectKw("IN")
      ShowNamespacesAndTablesCommand(qualified())
    }
  }

  // ---- CREATE TABLE (inside COMPILE USL DDL) ----
  // (reference grammar: LightningParser.g4:159-229; constraint rules
  //  parser/LightningParserUtils.scala:134-169)

  def parseCreateTable(): TableSpec = {
    // table-level hint annotations before CREATE: @DataQuality(name=...,
    // expression=...) / @AccessControl(...) (reference grammar
    // LightningParser.g4:165-175, parser/LightningParserUtils.scala:73-132)
    val dqs = Seq.newBuilder[DataQualitySpec]
    while (acceptSym('@')) {
      val annName = ident()
      val args = parseAnnotationArgs()
      if (annName.equalsIgnoreCase("DataQuality"))
        dqs += DataQualitySpec(
          args.getOrElse("name", fail("@DataQuality needs name=")),
          args.getOrElse("expression", fail("@DataQuality needs expression=")))
      // other annotations (@AccessControl, ...) are accepted and ignored,
      // matching the reference's hint semantics
    }
    expectKw("CREATE")
    expectKw("TABLE")
    if (acceptKw("IF")) { expectKw("NOT"); expectKw("EXISTS") }
    val name = qualified().last
    expectSym('(')
    val columns = Seq.newBuilder[ColumnSpec]
    var pk: Option[PrimaryKeySpec] = None
    val uniques = Seq.newBuilder[UniqueSpec]
    val fks = Seq.newBuilder[ForeignKeySpec]
    var first = true
    while (!acceptSym(')')) {
      if (!first) expectSym(',')
      first = false
      if (peekKw("PRIMARY") || peekKw("UNIQUE") || peekKw("FOREIGN") || peekKw("CONSTRAINT")) {
        val cname = if (acceptKw("CONSTRAINT")) Some(ident()) else None
        if (acceptKw("PRIMARY")) {
          expectKw("KEY")
          pk = Some(PrimaryKeySpec(parseColumnList(), cname))
        } else if (acceptKw("UNIQUE")) {
          uniques += UniqueSpec(parseColumnList(), cname)
        } else {
          expectKw("FOREIGN"); expectKw("KEY")
          val cols = parseColumnList()
          expectKw("REFERENCES")
          val refT = qualified()
          val refC = if (cur.isInstanceOf[Sym] && cur.asInstanceOf[Sym].ch == '(') parseColumnList() else cols
          var onDelete: Option[String] = None
          var onUpdate: Option[String] = None
          while (peekKw("ON")) {
            advance()
            if (acceptKw("DELETE")) onDelete = Some(parseFkAction())
            else { expectKw("UPDATE"); onUpdate = Some(parseFkAction()) }
          }
          fks += ForeignKeySpec(cols, refT, refC, cname, onDelete, onUpdate)
        }
      } else {
        columns += parseColumnDef()
      }
    }
    TableSpec(name, columns.result(), pk, uniques.result(), fks.result(),
      dataQualities = dqs.result())
  }

  /** `(k="v", k2="v2")` annotation arguments. */
  private def parseAnnotationArgs(): Map[String, String] = {
    if (!acceptSym('(')) return Map.empty
    val args = Map.newBuilder[String, String]
    var first = true
    while (!acceptSym(')')) {
      if (!first) expectSym(',')
      first = false
      val k = ident()
      expectSym('=')
      args += (k -> strLit())
    }
    args.result()
  }

  private def parseFkAction(): String =
    if (acceptKw("RESTRICT")) "RESTRICT"
    else if (acceptKw("CASCADE")) "CASCADE"
    else if (acceptKw("NO")) { expectKw("ACTION"); "NO ACTION" }
    else { expectKw("SET")
      if (acceptKw("NULL")) "SET NULL" else { expectKw("DEFAULT"); "SET DEFAULT" } }

  private def parseColumnList(): Seq[String] = {
    expectSym('(')
    val cols = Seq.newBuilder[String]
    var first = true
    while (!acceptSym(')')) {
      if (!first) expectSym(',')
      first = false
      cols += ident()
    }
    cols.result()
  }

  private def parseColumnDef(): ColumnSpec = {
    val name = ident()
    val dt = parseDataTypeString()
    var notNull = false
    var primaryKey = false
    var unique = false
    var references: Option[ForeignKeyRef] = None
    var more = true
    while (more) {
      if (acceptKw("NOT")) { expectKw("NULL"); notNull = true }
      else if (acceptKw("PRIMARY")) { expectKw("KEY"); primaryKey = true }
      else if (acceptKw("UNIQUE")) unique = true
      else if (acceptKw("REFERENCES")) {
        val t = qualified()
        val cols = parseColumnList()
        references = Some(ForeignKeyRef(t, cols))
      }
      else more = false
    }
    ColumnSpec(name, dt, notNull, primaryKey, unique, references)
  }

  /** Capture a type as its source string: IDENT plus balanced (...)/<...>,
    * plus the multi-word INTERVAL forms — validated downstream by
    * `DataType.fromDDL` (SURVEY.md §1.2 type lattice).
    */
  private def parseDataTypeString(): String = {
    val sb = new StringBuilder(ident())
    if (sb.toString.equalsIgnoreCase("interval")) {
      val units = Set("YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "TO")
      while (cur.isInstanceOf[Ident] && units.contains(cur.text.toUpperCase)) {
        sb.append(' ').append(advance().text)
      }
      return sb.toString
    }
    cur match {
      case Sym('(', _) =>
        sb.append('(')
        pos += 1
        var depth = 1
        while (depth > 0) {
          val t = advance()
          t match {
            case Sym('(', _) => depth += 1; sb.append('(')
            case Sym(')', _) => depth -= 1; if (depth > 0) sb.append(')')
            case Sym(',', _) => sb.append(',')
            case _: Eof => fail("unbalanced '(' in type")
            case tok => sb.append(tok.text)
          }
        }
        sb.append(')')
      case Sym('<', _) =>
        sb.append('<')
        pos += 1
        var depth = 1
        while (depth > 0) {
          val t = advance()
          t match {
            case Sym('<', _) => depth += 1; sb.append('<')
            case Sym('>', _) => depth -= 1; sb.append(if (depth > 0) ">" else ">")
            case Sym(',', _) => sb.append(',')
            case Sym(':', _) => sb.append(':')
            case Sym('(', _) => sb.append('(')
            case Sym(')', _) => sb.append(')')
            case _: Eof => fail("unbalanced '<' in type")
            case tok => sb.append(' ').append(tok.text)
          }
        }
      case _ =>
    }
    sb.toString
  }
}
