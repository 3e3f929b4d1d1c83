package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The DECODE STEP IS A STUB: real image/audio decoding needs native
  * libraries this container doesn't ship, so `decodeImageStub` derives
  * deterministic fake features from the bytes. Everything around it —
  * binary schema, metadata struct, batch shapes, partition behavior,
  * frame arithmetic — is real and oracle-tested; swapping the stub for
  * a JNI/Pandas-UDF decoder changes one function.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no base64
  * round-trips); metadata extraction is native expressions over the
  * bytes; frame sampling is arithmetic on offsets, so a 100 TB video
  * table only materializes the sampled frames.
  */
object Multimodal {

  /** Wrap a source column as an opaque media payload. */
  def asPayload(c: Column): Column = c.cast("binary")

  /** Typed metadata carried next to every payload. */
  def payloadMeta(payload: Column): Column = struct(
    octet_length(payload).as("n_bytes"),
    md5(payload).as("checksum"))

  /** STUB decoder — deterministic fake image features from the bytes.
    * Real implementation: a vectorized decoder over the binary batches
    * (mapInArrow / native Expression); feature shape stays identical.
    */
  def decodeImageStub(payload: Column): Column = struct(
    (octet_length(payload) % 640).as("width"),
    ((octet_length(payload) * 7) % 480).as("height"),
    lit("stub/raw").as("format"))

  /** Fixed-size frame count of a payload (frameSize bytes per frame). */
  def frameCount(payload: Column, frameSize: Int): Column =
    floor((octet_length(payload) - 1) / frameSize) + 1

  /** Number of frames kept when sampling every `stride`-th frame. */
  def sampledFrameCount(payload: Column, frameSize: Int, stride: Int): Column =
    floor((frameCount(payload, frameSize) - 1) / stride) + 1

  /** Checksum of the first frame (cheap content probe / thumbnail proxy). */
  def firstFrameChecksum(payload: Column, frameSize: Int): Column =
    md5(substring(payload, 1, frameSize))
}
