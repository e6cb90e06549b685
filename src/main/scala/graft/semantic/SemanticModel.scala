package graft.semantic

import java.io.InputStream
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Semantic-model graph mirroring the structure of the reference's
  * Cortex-Analyst YAML (/root/reference
  * semantic-models/healthcare_cdc_semantic_model.yaml:1-582): logical tables
  * with dimensions / time dimensions / facts and a primary key, FK-edge
  * relationships, and verified golden queries.
  */
final case class SemanticModel(
    name: String,
    description: String,
    tables: Seq[SemTable],
    relationships: Seq[Relationship],
    verifiedQueries: Seq[VerifiedQuery]) {

  def table(name: String): SemTable =
    tables.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"semantic table $name"))

  def relationship(name: String): Relationship =
    relationships.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"relationship $name"))

  /** Human/agent-readable rendering of the whole model: table and column
    * descriptions, types, synonyms, sample values, named filters,
    * relationships, and verified queries with their provenance stamps —
    * the prompt surface the reference's natural-language agent consumes
    * (descriptions and sample_values are what ground its column choice).
    */
  def documentation: String = {
    val sb = new StringBuilder
    sb ++= s"# $name\n$description\n"
    for (t <- tables) {
      sb ++= s"\n## table ${t.name}"
      if (t.synonyms.nonEmpty) sb ++= t.synonyms.mkString(" (aka ", ", ", ")")
      sb ++= "\n"
      if (t.description.nonEmpty) sb ++= s"${t.description}\n"
      def block(label: String, cs: Seq[SemColumn]): Unit = if (cs.nonEmpty) {
        sb ++= s"### $label\n"
        for (c <- cs) {
          sb ++= s"- ${c.name} (${c.dataType})"
          if (c.synonyms.nonEmpty) sb ++= c.synonyms.mkString(" aka ", ", ", "")
          if (c.description.nonEmpty) sb ++= s": ${c.description}"
          if (c.sampleValues.nonEmpty) sb ++= c.sampleValues.mkString(" e.g. [", ", ", "]")
          sb ++= "\n"
        }
      }
      block("dimensions", t.dimensions)
      block("time dimensions", t.timeDimensions)
      block("facts", t.facts)
      if (t.filters.nonEmpty) {
        sb ++= "### filters\n"
        for (f <- t.filters) sb ++= s"- ${f.name}: ${f.expr}\n"
      }
    }
    if (relationships.nonEmpty) {
      sb ++= "\n## relationships\n"
      for (r <- relationships)
        sb ++= s"- ${r.name}: ${r.leftTable} -> ${r.rightTable} (${r.joinType}) on " +
          r.columns.map { case (l, rc) => s"$l=$rc" }.mkString(", ") + "\n"
    }
    if (verifiedQueries.nonEmpty) {
      sb ++= "\n## verified queries\n"
      for (q <- verifiedQueries) {
        sb ++= s"- ${q.name}: ${q.question}"
        if (q.verifiedBy.nonEmpty) sb ++= s" [verified by ${q.verifiedBy}]"
        sb ++= "\n"
      }
    }
    sb.result()
  }

  /** Fail fast on CANONICAL-name collisions: two columns (or two named
    * filters) of one table sharing a canonical name would make resolution
    * depend on dimensions/time_dimensions/facts declaration order.
    *
    * Synonym collisions are deliberately NOT load errors: real Cortex models
    * declare overlapping synonyms as NL hints (the reference's appointments
    * table gives `last_modified`/`last_updated` to BOTH `_SNOWFLAKE_UPDATED_AT`
    * and `updated_at`, healthcare_cdc_semantic_model.yaml:128-134,184-191) —
    * a model that loads in the reference must load here. Addressing a column
    * BY an ambiguous synonym is refused at resolution time instead
    * ([[QueryBuilder]] and [[SemTable.filter]] both reject rather than take
    * declaration order). [[ambiguousAddresses]] surfaces them for tooling.
    * Returns `this` so load() can validate inline.
    */
  def validated: SemanticModel = {
    for (t <- tables) {
      val dupNames = (t.dimensions ++ t.timeDimensions ++ t.facts)
        .groupBy(_.name).filter(_._2.size > 1).keys
      require(dupNames.isEmpty,
        s"semantic table ${t.name}: duplicate column name(s) ${dupNames.mkString(", ")}")
      val dupFilters = t.filters.groupBy(_.name).filter(_._2.size > 1).keys
      require(dupFilters.isEmpty,
        s"semantic table ${t.name}: duplicate filter name(s) ${dupFilters.mkString(", ")}")
    }
    this
  }

  /** Per-table addresses (synonyms or names) that resolve to more than one
    * column — legal to declare, refused if used as a request address.
    */
  def ambiguousAddresses: Map[String, Set[String]] =
    tables.map { t =>
      val addrs = (t.dimensions ++ t.timeDimensions ++ t.facts)
        .flatMap(c => (c.name +: c.synonyms).distinct.map(_ -> c.name))
      t.name -> addrs.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    }.filter(_._2.nonEmpty).toMap
}

final case class SemTable(
    name: String,
    baseTable: String,
    primaryKey: Seq[String],
    dimensions: Seq[SemColumn],
    timeDimensions: Seq[SemColumn],
    facts: Seq[SemColumn],
    filters: Seq[SemNamedFilter] = Nil,
    synonyms: Seq[String] = Nil,
    description: String = "") {

  /** Resolve a named filter by its canonical name or any declared synonym;
    * refuses an ambiguous address rather than taking declaration order.
    */
  def filter(name: String): SemNamedFilter = {
    val matches = filters.filter(f => f.name == name || f.synonyms.contains(name))
    require(matches.map(_.name).distinct.size <= 1,
      s"semantic table ${this.name}: filter address '$name' is ambiguous: " +
        matches.map(_.name).distinct.mkString(", "))
    matches.headOption.getOrElse(
      throw new NoSuchElementException(
        s"semantic table ${this.name} declares no filter named '$name' " +
          s"(declared: ${filters.map(_.name).mkString(", ")})"))
  }
}

final case class SemColumn(
    name: String, expr: String, dataType: String, synonyms: Seq[String] = Nil,
    description: String = "", sampleValues: Seq[String] = Nil)

/** A model-declared reusable predicate (the Cortex semantic-model spec's
  * per-table `filters:` block): a name plus a SQL expression over the
  * table's physical columns, selectable by name or synonym at request time.
  */
final case class SemNamedFilter(
    name: String, expr: String, synonyms: Seq[String] = Nil)

final case class Relationship(
    name: String,
    leftTable: String,
    rightTable: String,
    joinType: String, // left_outer | inner
    columns: Seq[(String, String)]) // (left_column, right_column)

/** A golden query with its provenance stamp (the reference model records
  * who verified each query and when — verified_by/verified_at,
  * healthcare_cdc_semantic_model.yaml:596-597 — which is what makes a
  * "verified" query trustworthy to an agent).
  */
final case class VerifiedQuery(
    name: String, question: String, sql: String,
    useAsOnboardingQuestion: Boolean = false,
    verifiedBy: String = "", verifiedAt: Long = 0L)

object SemanticModel {

  /** Load from YAML (snakeyaml ships with Spark). */
  def load(in: InputStream): SemanticModel = {
    val root = new Yaml().load[java.util.Map[String, Object]](in).asScala

    def seqOfMaps(v: Object): Seq[scala.collection.mutable.Map[String, Object]] =
      Option(v).map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.toSeq.map(_.asScala)).getOrElse(Seq.empty)

    def str(m: scala.collection.Map[String, Object], k: String, dflt: String = ""): String =
      m.get(k).map(_.toString).getOrElse(dflt)

    // the reference model writes Postgres-quoted identifiers into expr /
    // base_table ('"appointment_id"', '"healthcare"') — the quotes are the
    // SOURCE system's case-preservation syntax, not part of the name
    def unquote(s: String): String =
      if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
      else s

    def strs(m: scala.collection.Map[String, Object], k: String): Seq[String] =
      Option(m.getOrElse(k, null))
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
        .getOrElse(Seq.empty)

    def cols(m: scala.collection.Map[String, Object], k: String): Seq[SemColumn] =
      seqOfMaps(m.getOrElse(k, null)).map(c =>
        SemColumn(str(c, "name"), unquote(str(c, "expr", str(c, "name"))), str(c, "data_type"),
          strs(c, "synonyms"), str(c, "description"), strs(c, "sample_values")))

    def filters(m: scala.collection.Map[String, Object]): Seq[SemNamedFilter] =
      seqOfMaps(m.getOrElse("filters", null)).map(f =>
        SemNamedFilter(str(f, "name"), str(f, "expr"), strs(f, "synonyms")))

    val tables = seqOfMaps(root.getOrElse("tables", null)).map { t =>
      val base = t.get("base_table").map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
      val pk = t.get("primary_key").map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
        .flatMap(_.get("columns"))
        .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq).getOrElse(Seq.empty)
      SemTable(
        name = str(t, "name"),
        baseTable = base.map(b => unquote(str(b, "table"))).getOrElse(str(t, "name")),
        primaryKey = pk,
        dimensions = cols(t, "dimensions"),
        timeDimensions = cols(t, "time_dimensions"),
        facts = cols(t, "facts"),
        filters = filters(t),
        synonyms = strs(t, "synonyms"),
        description = str(t, "description"))
    }

    val rels = seqOfMaps(root.getOrElse("relationships", null)).map { r =>
      val rc = seqOfMaps(r.getOrElse("relationship_columns", null))
        .map(c => (str(c, "left_column"), str(c, "right_column")))
      Relationship(str(r, "name"), str(r, "left_table"), str(r, "right_table"),
        str(r, "join_type", "left_outer"), rc)
    }

    val vqs = seqOfMaps(root.getOrElse("verified_queries", null)).map(q =>
      VerifiedQuery(str(q, "name"), str(q, "question"), str(q, "sql"),
        useAsOnboardingQuestion = str(q, "use_as_onboarding_question", "false").toBoolean,
        verifiedBy = str(q, "verified_by"),
        verifiedAt = str(q, "verified_at", "0").toLong))

    SemanticModel(str(root, "name"), str(root, "description"), tables, rels, vqs).validated
  }

  def loadResource(path: String): SemanticModel = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"resource $path not found")
    try load(in) finally in.close()
  }

  /** Load from a filesystem path (e.g. the reference's published model). */
  def loadFile(path: String): SemanticModel = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try load(in) finally in.close()
  }
}
