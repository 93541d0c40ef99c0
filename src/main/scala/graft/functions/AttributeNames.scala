package graft.functions

/** The pedestrian-attribute name table, in FC8 output order.
  *
  * This is the reference's public attribute API surface
  * (`alg/pedestrian/attr/DeepMAR.java:164-289`, ATTR_LIST): position i
  * of a recognizer output vector is the score for `NAMES(i)`. The
  * named-struct view of an `Array[Float]` attributes column is the
  * fixed projection `attrStruct` below (SURVEY F8).
  */
object AttributeNames {
  val NAMES: IndexedSeq[String] = IndexedSeq(
    "action_pulling", "lower_green", "gender_female", "upper_cotton",
    "accessory_other", "occlusion_accessory", "upper_other_color",
    "shoes_casual", "shoes_white", "lower_pants", "shoes_boot", "age_60",
    "weight_little_thin", "head_shoulder_mask", "upper_vest", "lower_white",
    "upper_black", "upper_white", "upper_shirt", "upper_silvery",
    "role_client", "upper_brown", "action_nipthing", "shoes_silver",
    "accessory_waistbag", "accessory_handbag", "action_picking",
    "shoes_black", "occlusion_down", "shoes_yellow", "gender_other",
    "accessory_shoulderbag", "upper_cotta", "occlusion_right",
    "action_pushing", "shoes_green", "action_armstretching", "shoes_other",
    "shoes_red", "lower_mix_color", "occlusion_left", "view_angle_left",
    "shoes_sport", "lower_gray", "upper_other", "accessory_kid",
    "head_shoulder_sunglasses", "lower_silver", "accessory_cart", "age_16",
    "hair_style_null", "upper_hoodie", "shoes_mix_color", "upper_green",
    "accessory_backpack", "age_older_60", "shoes_cloth", "action_chatting",
    "shoes_purple", "upper_suit", "lower_black", "lower_tight_pants",
    "occlusion_up", "action_holdthing", "lower_pink", "action_other",
    "lower_jean", "hair_style_long", "upper_red", "role_uniform",
    "lower_short_pants", "lower_one_piece", "lower_blue", "upper_tshirt",
    "upper_purple", "upper_pink", "action_lying", "shoes_pink",
    "shoes_shandle", "shoes_leather", "occlusion_environment",
    "view_angle_right", "shoes_other_color", "head_shoulder_with_hat",
    "age_30", "shoes_gray", "accessory_paperbag", "shoes_brown",
    "action_crouching", "lower_purple", "weight_very_thin", "shoes_blue",
    "action_gathering", "weight_normal", "action_running",
    "view_angle_front", "accessory_plasticbag", "head_shoulder_black_hair",
    "accessory_box", "lower_long_skirt", "shoes_orange", "weight_little_fat",
    "head_shoulder_scarf", "lower_other_color", "upper_jacket", "upper_gray",
    "lower_short_skirt", "age_45", "lower_skirt", "upper_sweater",
    "lower_brown", "lower_yellow", "occlusion_object", "upper_orange",
    "gender_male", "view_angle_back", "upper_blue", "lower_red",
    "head_shoulder_glasses", "upper_mix_color", "lower_orange",
    "upper_yellow", "weight_very_fat", "action_calling", "occlusion_other")

  val size: Int = NAMES.length

  /** Fixed projection from an array column to one named column per
    * attribute (reference F8: FC8 vector → named attributes). */
  def attrStruct(vec: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    NAMES.zipWithIndex.map { case (n, i) => vec.getItem(i).as(n) }
}
