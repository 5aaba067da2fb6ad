package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.CosineSimilarity

/** Session extension wiring (`spark.sql.extensions=graft.GraftExtensions`):
  * exposes graft's native expressions to SQL. A user of the reference
  * engine gets the library surface from Scala; SQL users get the same
  * functions through the registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        // coerce to array<double> (see Graft.registerFunctions): the
        // expression reads 8-byte slots, the embeddings column is
        // array<float>
        CosineSimilarity(
          org.apache.spark.sql.catalyst.expressions.Cast(children(0),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
          org.apache.spark.sql.catalyst.expressions.Cast(children(1),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
  }
}
