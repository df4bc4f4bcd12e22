package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 — local-collection source: the static country-code → (name,
  * continent) mapping. Data reproduced from the reference
  * (04b_gold_dim_countries.ipynb:144-255 (cell-4), 91 entries); codes
  * absent from the mapping fall back to name=code, continent='Unknown'
  * (D11, 04b:314-322 (cell-7)).
  */
object CountryMapping {

  val entries: Seq[(String, String, String)] = Seq(
    ("AD", "Andorra", "Europe"), ("AE", "United Arab Emirates", "Asia"),
    ("AR", "Argentina", "South America"), ("AT", "Austria", "Europe"),
    ("AU", "Australia", "Oceania"), ("BE", "Belgium", "Europe"),
    ("BG", "Bulgaria", "Europe"), ("BR", "Brazil", "South America"),
    ("CA", "Canada", "North America"), ("CH", "Switzerland", "Europe"),
    ("CL", "Chile", "South America"), ("CN", "China", "Asia"),
    ("CO", "Colombia", "South America"), ("CZ", "Czech Republic", "Europe"),
    ("DE", "Germany", "Europe"), ("DK", "Denmark", "Europe"),
    ("EC", "Ecuador", "South America"), ("EE", "Estonia", "Europe"),
    ("ES", "Spain", "Europe"), ("FI", "Finland", "Europe"),
    ("FR", "France", "Europe"), ("GB", "Great Britain", "Europe"),
    ("GR", "Greece", "Europe"), ("HK", "Hong Kong", "Asia"),
    ("HR", "Croatia", "Europe"), ("HU", "Hungary", "Europe"),
    ("ID", "Indonesia", "Asia"), ("IE", "Ireland", "Europe"),
    ("IL", "Israel", "Asia"), ("IN", "India", "Asia"),
    ("IS", "Iceland", "Europe"), ("IT", "Italy", "Europe"),
    ("JP", "Japan", "Asia"), ("KR", "South Korea", "Asia"),
    ("LT", "Lithuania", "Europe"), ("LU", "Luxembourg", "Europe"),
    ("LV", "Latvia", "Europe"), ("MX", "Mexico", "North America"),
    ("MY", "Malaysia", "Asia"), ("NL", "Netherlands", "Europe"),
    ("NO", "Norway", "Europe"), ("NZ", "New Zealand", "Oceania"),
    ("PE", "Peru", "South America"), ("PH", "Philippines", "Asia"),
    ("PL", "Poland", "Europe"), ("PT", "Portugal", "Europe"),
    ("RO", "Romania", "Europe"), ("RS", "Serbia", "Europe"),
    ("RU", "Russia", "Europe"), ("SA", "Saudi Arabia", "Asia"),
    ("SE", "Sweden", "Europe"), ("SG", "Singapore", "Asia"),
    ("SI", "Slovenia", "Europe"), ("SK", "Slovakia", "Europe"),
    ("TH", "Thailand", "Asia"), ("TR", "Turkey", "Asia"),
    ("TW", "Taiwan", "Asia"), ("UA", "Ukraine", "Europe"),
    ("US", "United States", "North America"), ("UY", "Uruguay", "South America"),
    ("VE", "Venezuela", "South America"), ("ZA", "South Africa", "Africa"),
    ("AM", "Armenia", "Asia"), ("AW", "Aruba", "North America"),
    ("AZ", "Azerbaijan", "Asia"), ("BA", "Bosnia and Herzegovina", "Europe"),
    ("BM", "Bermuda", "North America"), ("CR", "Costa Rica", "North America"),
    ("CY", "Cyprus", "Europe"), ("DO", "Dominican Republic", "North America"),
    ("EG", "Egypt", "Africa"), ("GG", "Guernsey", "Europe"),
    ("HN", "Honduras", "North America"), ("JE", "Jersey", "Europe"),
    ("KG", "Kyrgyzstan", "Asia"), ("KZ", "Kazakhstan", "Asia"),
    ("ME", "Montenegro", "Europe"), ("MK", "North Macedonia", "Europe"),
    ("MO", "Macau", "Asia"), ("MT", "Malta", "Europe"),
    ("NA", "Namibia", "Africa"), ("NG", "Nigeria", "Africa"),
    ("NP", "Nepal", "Asia"), ("PA", "Panama", "North America"),
    ("PR", "Puerto Rico", "North America"), ("PY", "Paraguay", "South America"),
    ("RE", "Reunion", "Africa"), ("UZ", "Uzbekistan", "Asia"),
    ("VI", "U.S. Virgin Islands", "North America"), ("VN", "Vietnam", "Asia"))

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("country_code", "country_name", "continent")
  }
}
