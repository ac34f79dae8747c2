package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The `injectParser` leg of `SparkSessionExtensions`: a delegating
  * parser adding one introspection statement,
  *
  *   SHOW GRAFT QUERIES
  *
  * which returns the engine's declared query inventory (name, whether it
  * has a DuckDB oracle, whether it is benchmarked) as a relation — the
  * SQL-native way to discover the `SparkEntry.queries` surface. Every
  * other statement is passed through verbatim, so the custom syntax adds
  * zero risk to normal SQL. (Pattern: wrap, intercept one statement,
  * delegate the rest — the standard shape for parser extensions.)
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val ShowQueries = """(?is)\s*SHOW\s+GRAFT\s+QUERIES\s*;?\s*""".r
  private val DescQuery = """(?is)\s*DESCRIBE\s+GRAFT\s+QUERY\s+(\w+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case ShowQueries() =>
      val out = Seq(
        AttributeReference("name", StringType, nullable = false)(),
        AttributeReference("has_oracle", BooleanType, nullable = false)(),
        AttributeReference("bench", BooleanType, nullable = false)())
      val oracles = graft.SparkEntry.oracleSql.keySet
      val benched = graft.SparkEntry.benchQueries.toSet
      val rows = graft.SparkEntry.queries.keys.toSeq.sorted.map { n =>
        InternalRow(UTF8String.fromString(n), oracles.contains(n), benched.contains(n))
      }
      LocalRelation(out, rows)
    case DescQuery(name) =>
      // parameterized custom statement: the query's oracle SQL (or an
      // explanatory row if it has none / doesn't exist)
      require(graft.SparkEntry.queries.contains(name),
        s"unknown graft query '$name' — SHOW GRAFT QUERIES lists the inventory")
      val out = Seq(
        AttributeReference("name", StringType, nullable = false)(),
        AttributeReference("oracle_sql", StringType, nullable = true)())
      val sql = graft.SparkEntry.oracleSql.get(name).orNull
      LocalRelation(out, Seq(InternalRow(UTF8String.fromString(name),
        if (sql == null) null else UTF8String.fromString(sql.trim))))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
