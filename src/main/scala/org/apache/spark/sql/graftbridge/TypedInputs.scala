package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/** Bridge for declaring expression input types: `AbstractDataType` is
  * private[sql], so expressions outside the Spark namespace cannot override
  * `ExpectsInputTypes.inputTypes` directly. Implement [[declaredInputTypes]]
  * with public `DataType`s instead — wrong argument types then fail analysis
  * with a clear error rather than an executor-side ClassCastException.
  */
trait TypedInputs extends ExpectsInputTypes { self: Expression =>
  /** Concrete input types, in child order. */
  def declaredInputTypes: Seq[DataType]
  override def inputTypes: Seq[AbstractDataType] = declaredInputTypes
}
