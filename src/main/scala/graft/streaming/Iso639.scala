package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static ISO-639 language-code tables — the engine-side equivalent of the
  * npm `iso-639-1` / `iso-639-2` / `iso-639-3` tables the reference
  * dashboard ships to every client (`web/src/script/store.js:4-6`), as
  * broadcast-sized lookup dims.
  *
  * Contents are public-registry data: the complete ISO-639-1 two-letter
  * set, and curated ISO-639-2B / ISO-639-3 subsets sized to the domain —
  * every three-letter Wikimedia project language code (the only keys this
  * pipeline can observe) plus the bibliographic codes where 639-2B diverges
  * from 639-2T (alb/arm/chi/dut/fre/ger/...). Names are the registry's
  * English names, first `;`-segment (the reference applies
  * `name.split(";")[0]` at lookup, `store.js:41`).
  */
object Iso639 {

  /** Complete ISO 639-1 (code → English name). */
  val iso1: Seq[(String, String)] = Seq(
    "aa" -> "Afar", "ab" -> "Abkhazian", "ae" -> "Avestan", "af" -> "Afrikaans",
    "ak" -> "Akan", "am" -> "Amharic", "an" -> "Aragonese", "ar" -> "Arabic",
    "as" -> "Assamese", "av" -> "Avaric", "ay" -> "Aymara", "az" -> "Azerbaijani",
    "ba" -> "Bashkir", "be" -> "Belarusian", "bg" -> "Bulgarian", "bh" -> "Bihari languages",
    "bi" -> "Bislama", "bm" -> "Bambara", "bn" -> "Bengali", "bo" -> "Tibetan",
    "br" -> "Breton", "bs" -> "Bosnian", "ca" -> "Catalan", "ce" -> "Chechen",
    "ch" -> "Chamorro", "co" -> "Corsican", "cr" -> "Cree", "cs" -> "Czech",
    "cu" -> "Church Slavic", "cv" -> "Chuvash", "cy" -> "Welsh", "da" -> "Danish",
    "de" -> "German", "dv" -> "Divehi", "dz" -> "Dzongkha", "ee" -> "Ewe",
    "el" -> "Greek", "en" -> "English", "eo" -> "Esperanto", "es" -> "Spanish",
    "et" -> "Estonian", "eu" -> "Basque", "fa" -> "Persian", "ff" -> "Fulah",
    "fi" -> "Finnish", "fj" -> "Fijian", "fo" -> "Faroese", "fr" -> "French",
    "fy" -> "Western Frisian", "ga" -> "Irish", "gd" -> "Scottish Gaelic", "gl" -> "Galician",
    "gn" -> "Guarani", "gu" -> "Gujarati", "gv" -> "Manx", "ha" -> "Hausa",
    "he" -> "Hebrew", "hi" -> "Hindi", "ho" -> "Hiri Motu", "hr" -> "Croatian",
    "ht" -> "Haitian", "hu" -> "Hungarian", "hy" -> "Armenian", "hz" -> "Herero",
    "ia" -> "Interlingua", "id" -> "Indonesian", "ie" -> "Interlingue", "ig" -> "Igbo",
    "ii" -> "Sichuan Yi", "ik" -> "Inupiaq", "io" -> "Ido", "is" -> "Icelandic",
    "it" -> "Italian", "iu" -> "Inuktitut", "ja" -> "Japanese", "jv" -> "Javanese",
    "ka" -> "Georgian", "kg" -> "Kongo", "ki" -> "Kikuyu", "kj" -> "Kuanyama",
    "kk" -> "Kazakh", "kl" -> "Kalaallisut", "km" -> "Central Khmer", "kn" -> "Kannada",
    "ko" -> "Korean", "kr" -> "Kanuri", "ks" -> "Kashmiri", "ku" -> "Kurdish",
    "kv" -> "Komi", "kw" -> "Cornish", "ky" -> "Kirghiz", "la" -> "Latin",
    "lb" -> "Luxembourgish", "lg" -> "Ganda", "li" -> "Limburgan", "ln" -> "Lingala",
    "lo" -> "Lao", "lt" -> "Lithuanian", "lu" -> "Luba-Katanga", "lv" -> "Latvian",
    "mg" -> "Malagasy", "mh" -> "Marshallese", "mi" -> "Maori", "mk" -> "Macedonian",
    "ml" -> "Malayalam", "mn" -> "Mongolian", "mr" -> "Marathi", "ms" -> "Malay",
    "mt" -> "Maltese", "my" -> "Burmese", "na" -> "Nauru", "nb" -> "Norwegian Bokmål",
    "nd" -> "North Ndebele", "ne" -> "Nepali", "ng" -> "Ndonga", "nl" -> "Dutch",
    "nn" -> "Norwegian Nynorsk", "no" -> "Norwegian", "nr" -> "South Ndebele", "nv" -> "Navajo",
    "ny" -> "Chichewa", "oc" -> "Occitan", "oj" -> "Ojibwa", "om" -> "Oromo",
    "or" -> "Oriya", "os" -> "Ossetian", "pa" -> "Panjabi", "pi" -> "Pali",
    "pl" -> "Polish", "ps" -> "Pushto", "pt" -> "Portuguese", "qu" -> "Quechua",
    "rm" -> "Romansh", "rn" -> "Rundi", "ro" -> "Romanian", "ru" -> "Russian",
    "rw" -> "Kinyarwanda", "sa" -> "Sanskrit", "sc" -> "Sardinian", "sd" -> "Sindhi",
    "se" -> "Northern Sami", "sg" -> "Sango", "si" -> "Sinhala", "sk" -> "Slovak",
    "sl" -> "Slovenian", "sm" -> "Samoan", "sn" -> "Shona", "so" -> "Somali",
    "sq" -> "Albanian", "sr" -> "Serbian", "ss" -> "Swati", "st" -> "Southern Sotho",
    "su" -> "Sundanese", "sv" -> "Swedish", "sw" -> "Swahili", "ta" -> "Tamil",
    "te" -> "Telugu", "tg" -> "Tajik", "th" -> "Thai", "ti" -> "Tigrinya",
    "tk" -> "Turkmen", "tl" -> "Tagalog", "tn" -> "Tswana", "to" -> "Tonga",
    "tr" -> "Turkish", "ts" -> "Tsonga", "tt" -> "Tatar", "tw" -> "Twi",
    "ty" -> "Tahitian", "ug" -> "Uighur", "uk" -> "Ukrainian", "ur" -> "Urdu",
    "uz" -> "Uzbek", "ve" -> "Venda", "vi" -> "Vietnamese", "vo" -> "Volapük",
    "wa" -> "Walloon", "wo" -> "Wolof", "xh" -> "Xhosa", "yi" -> "Yiddish",
    "yo" -> "Yoruba", "za" -> "Zhuang", "zh" -> "Chinese", "zu" -> "Zulu")

  /** ISO 639-2 bibliographic (B) codes → English name (first ;-segment).
    * Includes every code where B diverges from T, plus the three-letter
    * codes Wikimedia projects use that exist in 639-2.
    */
  val iso2b: Seq[(String, String)] = Seq(
    "ace" -> "Achinese", "ach" -> "Acoli", "ada" -> "Adangme", "ady" -> "Adyghe",
    "afh" -> "Afrihili", "ain" -> "Ainu", "akk" -> "Akkadian", "alb" -> "Albanian",
    "ale" -> "Aleut", "alt" -> "Southern Altai", "ang" -> "English, Old (ca.450-1100)",
    "anp" -> "Angika", "arc" -> "Official Aramaic (700-300 BCE)", "arg" -> "Aragonese",
    "arm" -> "Armenian", "arn" -> "Mapudungun", "arp" -> "Arapaho", "arw" -> "Arawak",
    "asm" -> "Assamese", "ast" -> "Asturian", "ath" -> "Athapascan languages",
    "ava" -> "Avaric", "awa" -> "Awadhi", "aym" -> "Aymara",
    "bai" -> "Bamileke languages", "bal" -> "Baluchi", "ban" -> "Balinese",
    "baq" -> "Basque", "bas" -> "Basa", "bej" -> "Beja", "bem" -> "Bemba",
    "bho" -> "Bhojpuri", "bik" -> "Bikol", "bin" -> "Bini", "bla" -> "Siksika",
    "bra" -> "Braj", "bua" -> "Buriat", "bug" -> "Buginese", "bur" -> "Burmese",
    "byn" -> "Blin", "cad" -> "Caddo", "car" -> "Galibi Carib", "ceb" -> "Cebuano",
    "chb" -> "Chibcha", "chg" -> "Chagatai", "chi" -> "Chinese", "chk" -> "Chuukese",
    "chm" -> "Mari", "chn" -> "Chinook jargon", "cho" -> "Choctaw",
    "chp" -> "Chipewyan", "chr" -> "Cherokee", "chy" -> "Cheyenne",
    "cop" -> "Coptic", "cpe" -> "Creoles and pidgins, English based",
    "crh" -> "Crimean Tatar", "csb" -> "Kashubian", "cze" -> "Czech",
    "dak" -> "Dakota", "dar" -> "Dargwa", "del" -> "Delaware", "den" -> "Slave (Athapascan)",
    "dgr" -> "Dogrib", "din" -> "Dinka", "doi" -> "Dogri", "dsb" -> "Lower Sorbian",
    "dua" -> "Duala", "dut" -> "Dutch", "dyu" -> "Dyula", "efi" -> "Efik",
    "egy" -> "Egyptian (Ancient)", "eka" -> "Ekajuk", "elx" -> "Elamite",
    "ewo" -> "Ewondo", "fan" -> "Fang", "fat" -> "Fanti", "fil" -> "Filipino",
    "fon" -> "Fon", "fre" -> "French", "frm" -> "French, Middle (ca.1400-1600)",
    "fro" -> "French, Old (842-ca.1400)", "frr" -> "Northern Frisian",
    "frs" -> "Eastern Frisian", "fur" -> "Friulian", "gaa" -> "Ga",
    "gag" -> "Gagauz", "gay" -> "Gayo", "gba" -> "Gbaya", "geo" -> "Georgian",
    "ger" -> "German", "gez" -> "Geez", "gil" -> "Gilbertese",
    "gmh" -> "German, Middle High (ca.1050-1500)", "goh" -> "German, Old High (ca.750-1050)",
    "gon" -> "Gondi", "gor" -> "Gorontalo", "got" -> "Gothic", "grb" -> "Grebo",
    "grc" -> "Greek, Ancient (to 1453)", "gre" -> "Greek, Modern (1453-)",
    "gsw" -> "Swiss German", "gwi" -> "Gwich'in", "hai" -> "Haida",
    "haw" -> "Hawaiian", "hil" -> "Hiligaynon", "hit" -> "Hittite",
    "hmn" -> "Hmong", "hsb" -> "Upper Sorbian", "hup" -> "Hupa", "iba" -> "Iban",
    "ice" -> "Icelandic", "ilo" -> "Iloko", "inh" -> "Ingush", "jbo" -> "Lojban",
    "jpr" -> "Judeo-Persian", "jrb" -> "Judeo-Arabic", "kaa" -> "Kara-Kalpak",
    "kab" -> "Kabyle", "kac" -> "Kachin", "kam" -> "Kamba", "kaw" -> "Kawi",
    "kbd" -> "Kabardian", "kha" -> "Khasi", "kho" -> "Khotanese",
    "kmb" -> "Kimbundu", "kok" -> "Konkani", "kos" -> "Kosraean", "kpe" -> "Kpelle",
    "krc" -> "Karachay-Balkar", "krl" -> "Karelian", "kru" -> "Kurukh",
    "kum" -> "Kumyk", "kut" -> "Kutenai", "lad" -> "Ladino", "lah" -> "Lahnda",
    "lam" -> "Lamba", "lez" -> "Lezghian", "lol" -> "Mongo", "loz" -> "Lozi",
    "lua" -> "Luba-Lulua", "lui" -> "Luiseno", "lun" -> "Lunda", "luo" -> "Luo (Kenya and Tanzania)",
    "lus" -> "Lushai", "mac" -> "Macedonian", "mad" -> "Madurese", "mag" -> "Magahi",
    "mai" -> "Maithili", "mak" -> "Makasar", "man" -> "Mandingo", "mao" -> "Maori",
    "mas" -> "Masai", "may" -> "Malay", "mdf" -> "Moksha", "mdr" -> "Mandar",
    "men" -> "Mende", "mga" -> "Irish, Middle (900-1200)", "mic" -> "Mi'kmaq",
    "min" -> "Minangkabau", "mnc" -> "Manchu", "mni" -> "Manipuri",
    "moh" -> "Mohawk", "mos" -> "Mossi", "mus" -> "Creek", "mwl" -> "Mirandese",
    "nah" -> "Nahuatl languages",
    "mwr" -> "Marwari", "myv" -> "Erzya", "nap" -> "Neapolitan", "nds" -> "Low German",
    "new" -> "Nepal Bhasa", "nia" -> "Nias", "niu" -> "Niuean", "nog" -> "Nogai",
    "non" -> "Norse, Old", "nov" -> "Novial", "nso" -> "Pedi", "nwc" -> "Classical Newari",
    "nym" -> "Nyamwezi", "nyn" -> "Nyankole", "nyo" -> "Nyoro", "nzi" -> "Nzima",
    "osa" -> "Osage", "ota" -> "Turkish, Ottoman (1500-1928)", "pag" -> "Pangasinan",
    "pal" -> "Pahlavi", "pam" -> "Pampanga", "pap" -> "Papiamento", "pau" -> "Palauan",
    "peo" -> "Persian, Old (ca.600-400 B.C.)", "per" -> "Persian", "phn" -> "Phoenician",
    "pon" -> "Pohnpeian", "pro" -> "Provençal, Old (to 1500)", "raj" -> "Rajasthani",
    "rap" -> "Rapanui", "rar" -> "Rarotongan", "rom" -> "Romany", "rum" -> "Romanian",
    "rup" -> "Aromanian", "sad" -> "Sandawe", "sah" -> "Yakut", "sam" -> "Samaritan Aramaic",
    "sas" -> "Sasak", "sat" -> "Santali", "scn" -> "Sicilian", "sco" -> "Scots",
    "sel" -> "Selkup", "sga" -> "Irish, Old (to 900)", "shn" -> "Shan",
    "sid" -> "Sidamo", "slo" -> "Slovak", "sma" -> "Southern Sami", "smj" -> "Lule Sami",
    "smn" -> "Inari Sami", "sms" -> "Skolt Sami", "snk" -> "Soninke",
    "sog" -> "Sogdian", "srn" -> "Sranan Tongo", "srr" -> "Serer", "suk" -> "Sukuma",
    "sus" -> "Susu", "sux" -> "Sumerian", "syc" -> "Classical Syriac", "syr" -> "Syriac",
    "tem" -> "Timne", "ter" -> "Tereno", "tet" -> "Tetum", "tib" -> "Tibetan",
    "tig" -> "Tigre", "tiv" -> "Tiv", "tkl" -> "Tokelau", "tlh" -> "Klingon",
    "tli" -> "Tlingit", "tmh" -> "Tamashek", "tog" -> "Tonga (Nyasa)",
    "tpi" -> "Tok Pisin", "tsi" -> "Tsimshian", "tum" -> "Tumbuka", "tvl" -> "Tuvalu",
    "tyv" -> "Tuvinian", "udm" -> "Udmurt", "uga" -> "Ugaritic", "umb" -> "Umbundu",
    "vai" -> "Vai", "vec" -> "Venetian", "vep" -> "Veps", "vot" -> "Votic",
    "wal" -> "Wolaitta", "war" -> "Waray", "was" -> "Washo", "wel" -> "Welsh",
    "xal" -> "Kalmyk", "yao" -> "Yao", "yap" -> "Yapese", "zap" -> "Zapotec",
    "zbl" -> "Blissymbols", "zen" -> "Zenaga", "zgh" -> "Standard Moroccan Tamazight",
    "zun" -> "Zuni", "zza" -> "Zaza")

  /** ISO 639-3 codes → English name, for codes NOT covered by 639-2 —
    * the Wikimedia project codes that only resolve through the 639-3
    * fallback leg of the reference's chain (`store.js:43-48`).
    */
  val iso3: Seq[(String, String)] = Seq(
    "arz" -> "Egyptian Arabic", "azb" -> "South Azerbaijani", "bar" -> "Bavarian",
    "bcl" -> "Central Bikol", "bjn" -> "Banjar", "bxr" -> "Russia Buriat",
    "cbk" -> "Chavacano", "cdo" -> "Min Dong Chinese", "ckb" -> "Central Kurdish",
    "diq" -> "Dimli", "dty" -> "Dotyali", "frp" -> "Arpitan", "gan" -> "Gan Chinese",
    "glk" -> "Gilaki", "gom" -> "Goan Konkani", "hak" -> "Hakka Chinese",
    "hif" -> "Fiji Hindi", "hyw" -> "Western Armenian", "jam" -> "Jamaican Creole English",
    "kbp" -> "Kabiyè", "koi" -> "Komi-Permyak", "ksh" -> "Kölsch",
    "lbe" -> "Lak", "lij" -> "Ligurian", "lld" -> "Ladin", "lmo" -> "Lombard",
    "ltg" -> "Latgalian", "mhr" -> "Eastern Mari", "mnw" -> "Mon",
    "mrj" -> "Western Mari", "mzn" -> "Mazanderani",
    "nqo" -> "N'Ko", "olo" -> "Livvi", "pcd" -> "Picard",
    "pcm" -> "Nigerian Pidgin", "pdc" -> "Pennsylvania German", "pfl" -> "Palatine German",
    "pih" -> "Pitcairn-Norfolk", "pnb" -> "Western Panjabi", "pnt" -> "Pontic",
    "pwn" -> "Paiwan", "rue" -> "Rusyn", "sgs" -> "Samogitian",
    "shi" -> "Tachelhit", "skr" -> "Saraiki", "stq" -> "Saterfriesisch",
    "szl" -> "Silesian", "szy" -> "Sakizaya", "tay" -> "Atayal", "tcy" -> "Tulu",
    "trv" -> "Taroko", "vls" -> "Vlaams", "wuu" -> "Wu Chinese",
    "xmf" -> "Mingrelian", "zea" -> "Zeeuws")

  def iso1Df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    iso1.toDF("code", "iso1_name")
  }
  def iso2bDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    iso2b.toDF("code", "iso2b_name")
  }
  def iso3Df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    iso3.toDF("code", "iso3_name")
  }

  /** `(code, name)` pairs rendered as a SQL VALUES list — the oracle's twin
    * tables are generated from the SAME data, so the hash-match checks the
    * chain logic, not a transcription.
    */
  def sqlValues(rows: Seq[(String, String)]): String =
    rows.map { case (c, n) => s"('$c', '${n.replace("'", "''")}')" }
      .mkString(", ")
}
