package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OCSF name ↔ uid mapping functions (`ocsf::category_uid/_name`,
  * `ocsf::class_uid/_name` — reference
  * `/root/reference/libtenzir/builtins/functions/ocsf.cpp:27-244`, which
  * exposes exactly these four string↔integer lookups over the published OCSF
  * category/class tables; the ids/names below are the public OCSF standard).
  *
  * Implementation: literal-map `element_at` — a constant broadcast into the
  * plan, fully codegen'd, null for unknown keys (the reference warns + nulls).
  */
object Ocsf {

  val categories: Map[String, Long] = Map(
    "System Activity" -> 1L,
    "Findings" -> 2L,
    "Identity & Access Management" -> 3L,
    "Network Activity" -> 4L,
    "Discovery" -> 5L,
    "Application Activity" -> 6L,
    "Remediation" -> 7L)

  val classes: Map[String, Long] = Map(
    "File System Activity" -> 1001L, "Kernel Extension Activity" -> 1002L,
    "Kernel Activity" -> 1003L, "Memory Activity" -> 1004L,
    "Module Activity" -> 1005L, "Scheduled Job Activity" -> 1006L,
    "Process Activity" -> 1007L, "Event Log Activity" -> 1008L,
    "Security Finding" -> 2001L, "Vulnerability Finding" -> 2002L,
    "Compliance Finding" -> 2003L, "Detection Finding" -> 2004L,
    "Incident Finding" -> 2005L, "Data Security Finding" -> 2006L,
    "Account Change" -> 3001L, "Authentication" -> 3002L,
    "Authorize Session" -> 3003L, "Entity Management" -> 3004L,
    "User Access Management" -> 3005L, "Group Management" -> 3006L,
    "Network Activity" -> 4001L, "HTTP Activity" -> 4002L,
    "DNS Activity" -> 4003L, "DHCP Activity" -> 4004L,
    "RDP Activity" -> 4005L, "SMB Activity" -> 4006L,
    "SSH Activity" -> 4007L, "FTP Activity" -> 4008L,
    "Email Activity" -> 4009L, "Network File Activity" -> 4010L,
    "Email File Activity" -> 4011L, "Email URL Activity" -> 4012L,
    "NTP Activity" -> 4013L, "Tunnel Activity" -> 4014L,
    "Device Inventory Info" -> 5001L, "Device Config State" -> 5002L,
    "User Inventory Info" -> 5003L, "Operating System Patch State" -> 5004L,
    "Kernel Object Query" -> 5006L, "File Query" -> 5007L,
    "Folder Query" -> 5008L, "Admin Group Query" -> 5009L,
    "Job Query" -> 5010L, "Module Query" -> 5011L,
    "Network Connection Query" -> 5012L, "Networks Query" -> 5013L,
    "Peripheral Device Query" -> 5014L, "Process Query" -> 5015L,
    "Service Query" -> 5016L, "User Session Query" -> 5017L,
    "User Query" -> 5018L, "Device Config State Change" -> 5019L,
    "Software Inventory Info" -> 5020L,
    "Web Resources Activity" -> 6001L, "Application Lifecycle" -> 6002L,
    "API Activity" -> 6003L, "Web Resource Access Activity" -> 6004L,
    "Datastore Activity" -> 6005L, "File Hosting Activity" -> 6006L,
    "Scan Activity" -> 6007L,
    "Remediation Activity" -> 7001L, "File Remediation Activity" -> 7002L,
    "Process Remediation Activity" -> 7003L, "Network Remediation Activity" -> 7004L)

  private def toUid(m: Map[String, Long], name: Column): Column =
    element_at(typedlit(m), name)

  private def toName(m: Map[String, Long], uid: Column): Column =
    element_at(typedlit(m.map(_.swap)), uid.cast("long"))

  /** `ocsf::category_uid("Network Activity")` → 4 (null if unknown). */
  def categoryUid(name: Column): Column = toUid(categories, name)

  /** `ocsf::category_name(4)` → "Network Activity". */
  def categoryName(uid: Column): Column = toName(categories, uid)

  /** `ocsf::class_uid("HTTP Activity")` → 4002. */
  def classUid(name: Column): Column = toUid(classes, name)

  /** `ocsf::class_name(4002)` → "HTTP Activity". */
  def className(uid: Column): Column = toName(classes, uid)
}
