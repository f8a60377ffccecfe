package graft.pipeline

/** US state/territory abbreviation → full name (public USPS list).
  *
  * The reference ships this as a Python dict broadcast to executors and
  * consumed through a row-at-a-time UDF
  * (/root/reference/pipelineApplication/silverLayer/StateAbbreviationDict.py:4-59;
  * Helpers_FunctionsDicts.py:66-80). Here it is a plain Scala map consumed via
  * `element_at(typedLit(...))` — a foldable Catalyst expression that stays
  * inside whole-stage codegen, needs no broadcast plumbing, and never pays a
  * per-row interpreter hop (SURVEY.md §4.3).
  */
object StateMap {
  val abbrevToName: Map[String, String] = Map(
    "AL" -> "Alabama", "AK" -> "Alaska", "AZ" -> "Arizona",
    "AR" -> "Arkansas", "CA" -> "California", "CO" -> "Colorado",
    "CT" -> "Connecticut", "DE" -> "Delaware", "DC" -> "District Of Columbia",
    "FL" -> "Florida", "GA" -> "Georgia", "HI" -> "Hawaii",
    "ID" -> "Idaho", "IL" -> "Illinois", "IN" -> "Indiana",
    "IA" -> "Iowa", "KS" -> "Kansas", "KY" -> "Kentucky",
    "LA" -> "Louisiana", "ME" -> "Maine", "MD" -> "Maryland",
    "MA" -> "Massachusetts", "MI" -> "Michigan", "MN" -> "Minnesota",
    "MS" -> "Mississippi", "MO" -> "Missouri", "MT" -> "Montana",
    "NE" -> "Nebraska", "NV" -> "Nevada", "NH" -> "New Hampshire",
    "NJ" -> "New Jersey", "NM" -> "New Mexico", "NY" -> "New York",
    "NC" -> "North Carolina", "ND" -> "North Dakota", "OH" -> "Ohio",
    "OK" -> "Oklahoma", "OR" -> "Oregon", "PA" -> "Pennsylvania",
    "RI" -> "Rhode Island", "SC" -> "South Carolina", "SD" -> "South Dakota",
    "TN" -> "Tennessee", "TX" -> "Texas", "UT" -> "Utah",
    "VT" -> "Vermont", "VA" -> "Virginia", "WA" -> "Washington",
    "WV" -> "West Virginia", "WI" -> "Wisconsin", "WY" -> "Wyoming",
    "AS" -> "American Samoa", "GU" -> "Guam",
    "MP" -> "Northern Mariana Islands", "PR" -> "Puerto Rico",
    "VI" -> "Virgin Islands")
}
