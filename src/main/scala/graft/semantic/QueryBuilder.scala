package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A column reference into the semantic graph: `table` is the SEMANTIC table
  * name, `column` the SEMANTIC column name (resolved to its declared expr).
  */
final case class SemRef(table: String, column: String)

/** An aggregate over the graph. `fn`:
  *  - `count_star` (ref ignored), `count`, `count_distinct`, `sum`, `min`, `max`
  *  - `sum_money` / `avg_money`: exact DECIMAL(18,2) accumulation surfaced as
  *    DOUBLE (avg rounded to 2 dp) — the engine-wide money-parity rule.
  */
final case class SemMetric(fn: String, ref: Option[SemRef], alias: String)

/** Pre-aggregation predicate. `op` ∈ is_null, is_not_null, eq, ne, gte, lte;
  * `value` is parsed per the referenced column's declared data_type.
  */
final case class SemFilter(ref: SemRef, op: String, value: Option[String] = None)

/** Ordering over OUTPUT aliases (dimension column names / metric aliases). */
final case class SemOrder(alias: String, desc: Boolean = false, nullsLast: Boolean = false)

/** A deterministic query request against the model graph — the compile
  * input Cortex Analyst would produce from a natural-language question
  * (NL understanding itself is out of scope, SURVEY §3 EP3).
  *
  * `namedFilters` select model-declared reusable predicates (the YAML's
  * per-table `filters:` blocks) by table + filter name/synonym; each is
  * applied to its table's frame BELOW the join (the J4 rule), exactly like
  * the always-on soft-delete exclusion.
  */
final case class SemanticRequest(
    root: String,
    relationships: Seq[String] = Nil,
    dimensions: Seq[SemRef] = Nil,
    metrics: Seq[SemMetric] = Nil,
    filters: Seq[SemFilter] = Nil,
    namedFilters: Seq[SemRef] = Nil,
    orderBy: Seq[SemOrder] = Nil)

/** Deterministic query compilation over a [[SemanticModel]] (reference EP3).
  *
  * `compile` turns a (dimensions, metrics, filters, order) request into a
  * DataFrame using ONLY what the YAML graph declares — tables join through
  * declared relationships, columns resolve through declared dimension/fact
  * exprs (plus primary-key and relationship columns), and unknown references
  * are rejected. The builder supplies the guarantees the reference's agent
  * setup encodes:
  *   1. the soft-delete filter `_snowflake_deleted = FALSE` is ALWAYS
  *      injected, on every table including join sides
  *      (healthcare_cdc_semantic_model.yaml:594,614,637-638) — filtering the
  *      right side BELOW a left join preserves left rows exactly like the
  *      verified SQL's ON-clause predicate (the J4 rule);
  *   2. joins resolve through declared relationships only;
  *   3. ordering is explicit about NULLS placement.
  */
final class QueryBuilder(model: SemanticModel, source: String => DataFrame) {

  private val Deleted = "_snowflake_deleted"

  /** A semantic table as a DataFrame with the soft-delete filter injected. */
  def table(name: String): DataFrame = {
    val t = model.table(name)
    source(t.baseTable).filter(col(Deleted) === false)
  }

  /** Join two semantic tables through a declared relationship. Extra
    * predicates ride in the ON clause (preserving left rows on outer joins —
    * the J4 rule).
    */
  def joined(relName: String, extraOn: Column = lit(true)): DataFrame = {
    val r = model.relationship(relName)
    val left = table(r.leftTable).as("l")
    val right = table(r.rightTable).as("r")
    val cond = r.columns.map { case (lc, rc) => col(s"l.$lc") === col(s"r.$rc") }
      .reduce(_ && _) && extraOn
    left.join(right, cond, sparkJoinType(r.joinType))
  }

  private def sparkJoinType(t: String): String = t match {
    case "left_outer" => "left"
    case other => other
  }

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Resolve a semantic ref to a qualified Column + its declared data_type.
    * Legal references: declared dimensions / time_dimensions / facts (by
    * semantic name → expr), the table's primary key, and columns the graph
    * uses in a declared relationship (FKs are model-visible even when not
    * listed as dimensions).
    */
  private final case class Resolved(
      column: Column, dataType: String, canonical: String, physical: String)

  /** Resolve by canonical name OR any declared synonym — the model's
    * `synonyms:` blocks are first-class addresses, as in the reference's
    * Cortex spec (nearly every dimension there declares them).
    */
  private def resolve(ref: SemRef): Resolved = {
    val t = model.table(ref.table)
    // models built programmatically can bypass SemanticModel.validated —
    // still refuse a first-declared-wins resolution on ambiguous addresses
    val matches = (t.dimensions ++ t.timeDimensions ++ t.facts)
      .filter(c => c.name == ref.column || c.synonyms.contains(ref.column))
    require(matches.map(_.name).distinct.size <= 1,
      s"${ref.table}.${ref.column} is ambiguous: matches " +
        matches.map(_.name).distinct.mkString(", "))
    val declared = matches.headOption
    val physical = declared.map(_.expr).orElse {
      val relCols = model.relationships.flatMap { r =>
        (if (r.leftTable == ref.table) r.columns.map(_._1) else Nil) ++
          (if (r.rightTable == ref.table) r.columns.map(_._2) else Nil)
      }
      if (t.primaryKey.contains(ref.column) || relCols.contains(ref.column))
        Some(ref.column)
      else None
    }.getOrElse(throw new NoSuchElementException(
      s"${ref.table}.${ref.column} is not declared in the semantic model"))
    require(Ident.matches(physical),
      s"${ref.table}.${ref.column}: expr '$physical' is not a plain column and cannot be table-qualified")
    Resolved(col(s"${ref.table}.$physical"),
      declared.map(_.dataType).getOrElse(""),
      declared.map(_.name).getOrElse(ref.column),
      physical)
  }

  /** Literal typing from a declared data_type. Declared types are normalized
    * the way the reference writes them — upper case with a precision suffix
    * (`TIMESTAMP_NTZ(9)`, `NUMBER(38,0)`, `TIME(9)`,
    * healthcare_cdc_semantic_model.yaml) — so `DATE` and `date` and
    * `NUMBER(38,0)` all type their literals, not just the bare lower-case
    * spellings.
    */
  private def typedLit(value: String, dataType: String): Column = {
    val base = dataType.toLowerCase(java.util.Locale.ROOT).takeWhile(_ != '(').trim
    base match {
      case "date" => lit(value).cast("date")
      case "timestamp_ntz" | "timestamp" | "timestamp_ltz" | "timestamp_tz" =>
        lit(value).cast("timestamp")
      case "boolean" => lit(value.toBoolean)
      case "number" | "decimal" | "numeric" => lit(value).cast("decimal(18,2)")
      case _ => lit(value) // varchar/text/time-as-string compare as strings
    }
  }

  /** Literal typing for refs with no declared data_type (PK/FK-only columns):
    * infer from the base table's Spark schema instead of falling through to a
    * raw string literal — a string compared to a numeric/date column would
    * lean on implicit casts and can silently misbehave.
    */
  private def schemaTypedLit(value: String, ref: SemRef, physical: String): Column = {
    val base = model.table(ref.table).baseTable
    val field = source(base).schema.find(_.name == physical).getOrElse(
      throw new NoSuchElementException(
        s"${ref.table}.${ref.column}: physical column $physical not in base table $base"))
    field.dataType match {
      case org.apache.spark.sql.types.StringType => lit(value)
      case other => lit(value).cast(other)
    }
  }

  private def filterCol(f: SemFilter): Column = {
    val r = resolve(f.ref)
    val (c, dt) = (r.column, r.dataType)
    def v = {
      val raw = f.value.getOrElse(
        throw new IllegalArgumentException(s"filter ${f.op} on ${f.ref} needs a value"))
      if (dt.nonEmpty) typedLit(raw, dt) else schemaTypedLit(raw, f.ref, r.physical)
    }
    f.op match {
      case "is_null" => c.isNull
      case "is_not_null" => c.isNotNull
      case "eq" => c === v
      case "ne" => c =!= v
      case "gte" => c >= v
      case "lte" => c <= v
      // TO_DATE(ts) = <date> — the day-equality predicate the reference's
      // verified "modified today" query uses (yaml:612); value is a date
      // literal regardless of the column's declared (timestamp) type
      case "eq_date" => to_date(c) === lit(f.value.getOrElse(
        throw new IllegalArgumentException(s"filter eq_date on ${f.ref} needs a value")))
        .cast("date")
      case other => throw new IllegalArgumentException(s"unknown filter op $other")
    }
  }

  private def metricCol(m: SemMetric): Column = {
    def c = resolve(m.ref.getOrElse(throw new IllegalArgumentException(
      s"metric ${m.fn} as ${m.alias} needs a column ref"))).column
    val agg = m.fn match {
      case "count_star" => count(lit(1))
      case "count" => count(c)
      case "count_distinct" => countDistinct(c)
      case "sum" => sum(c)
      case "min" => min(c)
      case "max" => max(c)
      case "sum_money" => sum(c.cast("decimal(18,2)")).cast("double")
      case "avg_money" => graft.functions.SnowflakeFunctions.moneyAvg2(c)
      case other => throw new IllegalArgumentException(s"unknown metric fn $other")
    }
    agg.as(m.alias)
  }

  private def orderCol(o: SemOrder): Column = (o.desc, o.nullsLast) match {
    case (true, true) => col(o.alias).desc_nulls_last
    case (true, false) => col(o.alias).desc
    case (false, true) => col(o.alias).asc_nulls_last
    case (false, false) => col(o.alias).asc
  }

  /** Compile a request into a DataFrame through the declared graph. */
  def compile(req: SemanticRequest): DataFrame = {
    require(req.metrics.nonEmpty || req.dimensions.nonEmpty,
      "request needs at least one dimension or metric")
    // model-declared named filters apply to their table's frame BELOW the
    // join (J4: an outer join's preserved side keeps its rows)
    val namedByTable = req.namedFilters.groupBy(_.table).map { case (t, refs) =>
      t -> refs.map(r => model.table(t).filter(r.column))
    }
    def tableFrame(name: String): DataFrame =
      namedByTable.getOrElse(name, Nil)
        .foldLeft(table(name))((d, f) => d.filter(expr(f.expr)))
    namedByTable.keys.foreach(t => require(
      t == req.root || req.relationships.exists(model.relationship(_).rightTable == t),
      s"named filter on $t, but $t is not in the join tree"))
    // join tree: every relationship must attach a NEW table to one already
    // in the tree via its declared left side (the preserved side)
    var inTree = Set(req.root)
    var df = tableFrame(req.root).as(req.root)
    req.relationships.foreach { relName =>
      val r = model.relationship(relName)
      require(inTree(r.leftTable),
        s"relationship $relName: left table ${r.leftTable} not in the join tree $inTree")
      require(!inTree(r.rightTable),
        s"relationship $relName: ${r.rightTable} already joined (self-joins unsupported)")
      val cond = r.columns.map { case (lc, rc) =>
        col(s"${r.leftTable}.$lc") === col(s"${r.rightTable}.$rc")
      }.reduce(_ && _)
      df = df.join(tableFrame(r.rightTable).as(r.rightTable), cond, sparkJoinType(r.joinType))
      inTree += r.rightTable
    }
    val filtered = req.filters.map(filterCol).foldLeft(df)(_ filter _)
    // dimensions surface under their CANONICAL names (synonym-addressed refs
    // normalize); two same-named dimensions from different tables would make
    // the output schema ill-formed and the orderBy-on-alias ambiguous
    val dimAliases = req.dimensions.map(d => resolve(d).canonical)
    require(dimAliases.distinct.size == dimAliases.size,
      s"duplicate dimension output names ${dimAliases.diff(dimAliases.distinct).distinct.mkString(", ")}: " +
        "two dimensions resolve to the same column name — drop one or extend " +
        "the model with a distinctly-named dimension (e.g. doctor_first_name)")
    val dimCols = req.dimensions.zip(dimAliases).map { case (d, a) => resolve(d).column.as(a) }
    val aggCols = req.metrics.map(metricCol)
    val aggregated =
      if (req.dimensions.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
      else if (req.metrics.isEmpty) filtered.select(dimCols: _*).distinct()
      else filtered.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
    if (req.orderBy.isEmpty) aggregated
    else aggregated.orderBy(req.orderBy.map(orderCol): _*)
  }

  /** Execute a verified query by name — the golden contract, expressed as
    * requests through the generic compile path.
    */
  def verified(name: String): DataFrame = name match {
    case "total_appointments_summary" => compile(SemanticRequest(
      root = "appointments",
      metrics = Seq(
        SemMetric("count_star", None, "total_appointments"),
        SemMetric("count_distinct", Some(SemRef("appointments", "patient_id")), "unique_patients"),
        SemMetric("count_distinct", Some(SemRef("appointments", "doctor_id")), "unique_doctors"),
        SemMetric("min", Some(SemRef("appointments", "appointment_date")), "earliest"),
        SemMetric("max", Some(SemRef("appointments", "appointment_date")), "latest"))))

    case "appointments_modified_recently" => compile(SemanticRequest(
      root = "appointments",
      dimensions = Seq(SemRef("appointments", "status")),
      metrics = Seq(SemMetric("count_star", None, "modified_count")),
      filters = Seq(SemFilter(SemRef("appointments", "updated_at"), "is_not_null")),
      orderBy = Seq(
        SemOrder("modified_count", desc = true, nullsLast = true),
        SemOrder("status"))))

    case "revenue_by_doctor" => compile(SemanticRequest(
      root = "doctors",
      relationships = Seq("visits_to_doctors"),
      dimensions = Seq(
        SemRef("doctors", "doctor_id"), SemRef("doctors", "first_name"),
        SemRef("doctors", "last_name"), SemRef("doctors", "specialization"),
        SemRef("doctors", "department")),
      metrics = Seq(
        SemMetric("count", Some(SemRef("visits", "visit_id")), "total_visits"),
        SemMetric("sum_money", Some(SemRef("visits", "total_charge")), "total_revenue"),
        SemMetric("min", Some(SemRef("visits", "visit_date")), "first_visit"),
        SemMetric("max", Some(SemRef("visits", "visit_date")), "last_visit")),
      orderBy = Seq(
        SemOrder("total_revenue", desc = true, nullsLast = true),
        SemOrder("doctor_id"))))

    case other =>
      throw new NoSuchElementException(s"no builder for verified query $other")
  }
}
