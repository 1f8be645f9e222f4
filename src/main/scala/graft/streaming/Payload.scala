package graft.streaming

/** Row-payload byte serialization shared by the stateful streaming
  * operators (as-of join, Top-N): values ride through
  * `flatMapGroupsWithState` state as opaque bytes because Spark needs a
  * concrete encoder for state classes, and the operators are
  * schema-generic.
  */
private[streaming] object Payload {

  def ser(values: Seq[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.ObjectOutputStream(bos)
    o.writeObject(values.toVector)
    o.close()
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): Seq[Any] =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[Vector[Any]]
}
