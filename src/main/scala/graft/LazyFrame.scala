package graft

import org.apache.spark.{Dependency, OneToOneDependency, Partition, SparkContext, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** An RDD that resolves its parent lazily, at first DAG use. Iterative
  * operators (connected components, the line-dedup heavy-hitter collects)
  * necessarily run Spark jobs while BUILDING their result; wrapping them in
  * a ThunkRDD moves that cost from DataFrame construction to first action,
  * so an explain-only consumer (plan audits, the driver's query sweep
  * enumeration) pays nothing.
  *
  * Laziness mechanics: `getPartitions`/`getDependencies` fire only when the
  * DAGScheduler first walks the RDD — i.e. at the first real action on the
  * wrapping DataFrame. Both `thunk` and `target` are @transient: the
  * executor-side task never needs them because the scheduler memoizes the
  * resolved dependency list (non-transient `dependencies_` in RDD) into the
  * serialized task binary, and `compute` reads the parent through it.
  */
private[graft] class ThunkRDD(sc: SparkContext,
    @transient thunk: () => RDD[InternalRow])
  extends RDD[InternalRow](sc, Nil) {

  @transient private lazy val target: RDD[InternalRow] = thunk()

  override protected def getDependencies: Seq[Dependency[_]] =
    Seq(new OneToOneDependency(target))

  override protected def getPartitions: Array[Partition] = target.partitions

  override def compute(split: Partition, context: TaskContext): Iterator[InternalRow] =
    firstParent[InternalRow].iterator(split, context)
}

/** Defer a DataFrame-producing computation to first action. The schema
  * must be declared up front (the plan needs it before the thunk runs) and
  * is checked against the produced frame's schema — field names and types,
  * nullability ignored — because the wrapped rows are consumed binary
  * (`InternalRow` layout is positional).
  */
object LazyFrame {
  def apply(spark: SparkSession, schema: StructType)(thunk: => DataFrame): DataFrame = {
    val rdd = new ThunkRDD(spark.sparkContext, () => {
      val df = thunk
      val got = df.schema.map(f => (f.name, f.dataType))
      val want = schema.map(f => (f.name, f.dataType))
      require(got == want,
        s"LazyFrame: thunk produced schema $got, declared $want")
      df.queryExecution.toRdd
    })
    GraftSqlShim.internalCreateDataFrame(spark, rdd, schema)
  }
}
