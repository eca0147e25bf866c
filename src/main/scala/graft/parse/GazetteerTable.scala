package graft.parse

/** Bundled offline gazetteer — the deterministic stand-in for the reference's
  * Nominatim forward/reverse geocoding (reference: geoextent/lib/gazetteer.py:
  * 219-250 candidate lists with boundingbox polygons, :594-650 ranked limit-5
  * candidates). Three hundred place entries plus region entries carrying
  * boundary rings, so the reverse-geocode path (q50) exercises both
  * polygon-containment hits and nearest-point fallback at a realistic table
  * size instead of a 12-row toy.
  *
  * Coordinates are eighth-degree approximations of well-known public city
  * locations (exact binary fractions → float-stable goldens; the four
  * original odd-fraction entries are kept bit-identical so every existing
  * golden still holds). Names are chosen so that no entry is a word-boundary
  * substring of another and none collides with the synthetic corpus
  * vocabulary (months, period names, payload tokens) — asserted by
  * GazetteerSpec, which keeps additions honest.
  */
object GazetteerTable {

  /** ring = closed interleaved (lon,lat) rectangle, corners at odd multiples
    * of 1/256° so a probe at 1/128° granularity can never land exactly on an
    * edge (the PIP edge rule never decides a result).
    */
  final case class Entry(name: String, hits: Seq[(Double, Double)],
                         ring: Option[Array[Double]] = None)

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Array[Double] =
    Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)
  private val Eps = 0.00390625 // 1/256

  /** Region entries with admin-boundary rings (the gazetteer.py boundingbox
    * analog): point = ring centroid-ish seat of the region.
    */
  val regions: Seq[Entry] = Seq(
    Entry("Westphalia", Seq((51.625, 7.875)),
      Some(rect(6.5 + Eps, 50.5 + Eps, 9.5 - Eps, 52.5 - Eps))),
    Entry("Bavaria", Seq((48.75, 11.5)),
      Some(rect(9.0 + Eps, 47.25 + Eps, 13.75 - Eps, 50.5 - Eps))),
    Entry("Catalonia", Seq((41.75, 1.75)),
      Some(rect(0.125 + Eps, 40.5 + Eps, 3.25 - Eps, 42.75 - Eps))),
    Entry("Tuscany", Seq((43.375, 11.125)),
      Some(rect(9.625 + Eps, 42.25 + Eps, 12.375 - Eps, 44.375 - Eps))),
    Entry("Andalusia", Seq((37.5, -4.75)),
      Some(rect(-7.5 + Eps, 36.0 + Eps, -1.625 - Eps, 38.625 - Eps))),
    Entry("Bohemia", Seq((49.875, 14.5)),
      Some(rect(12.0 + Eps, 48.5 + Eps, 16.5 - Eps, 51.0 - Eps))),
    Entry("Provence", Seq((43.5, 5.875)),
      Some(rect(4.125 + Eps, 43.0 + Eps, 7.625 - Eps, 44.875 - Eps))),
    Entry("Flanders", Seq((51.0, 3.75)),
      Some(rect(2.5 + Eps, 50.625 + Eps, 5.75 - Eps, 51.5 - Eps))),
  )

  /** The original twelve entries, byte-identical to the pre-scale table
    * (existing goldens and planted-corpus oracles depend on them).
    */
  private val original: Seq[Entry] = Seq(
    Entry("Amsterdam", Seq((52.375, 4.875))),
    Entry("Berlin", Seq((52.5, 13.375))),
    Entry("Paris", Seq((48.875, 2.375))),
    Entry("Madrid", Seq((40.5, -3.625))),
    Entry("Rome", Seq((41.875, 12.5))),
    Entry("Muenster", Seq((51.9625, 7.625))),
    Entry("Barcelona", Seq((41.375, 2.125))),
    Entry("London", Seq((51.5, -0.125))),
    Entry("Vienna", Seq((48.25, 16.375))),
    Entry("Lisbon", Seq((38.75, -9.125))),
    Entry("Springfield", Seq((39.75, -89.625), (42.125, -72.5))),
    Entry("Cambridge", Seq((52.25, 0.125), (42.375, -71.125))),
  )

  /** Additional multi-candidate names (ranked; "drop" skips them, "top" takes
    * the first — reference ner_ambiguity semantics).
    */
  private val ambiguous: Seq[Entry] = Seq(
    Entry("Valencia", Seq((39.5, -0.375), (10.125, -68.0))),
    Entry("Cordoba", Seq((37.875, -4.75), (-31.375, -64.125))),
    Entry("Santiago", Seq((-33.375, -70.625), (42.875, -8.5))),
    Entry("Birmingham", Seq((52.5, -1.875), (33.5, -86.75))),
    Entry("Alexandria", Seq((31.25, 29.875), (38.75, -77.0))),
    Entry("Richmond", Seq((37.5, -77.375), (51.375, -0.25))),
    Entry("Tripoli", Seq((32.875, 13.125), (34.375, 35.875))),
    Entry("Hyderabad", Seq((17.375, 78.5), (25.375, 68.375))),
  )

  private def e(name: String, lat: Double, lon: Double): Entry =
    Entry(name, Seq((lat, lon)))

  /** Single-candidate world cities, eighth-degree coordinates. */
  private val cities: Seq[Entry] = Seq(
    // Europe
    e("Oslo", 59.875, 10.75), e("Stockholm", 59.375, 18.0),
    e("Copenhagen", 55.625, 12.5), e("Helsinki", 60.125, 25.0),
    e("Reykjavik", 64.125, -21.875), e("Dublin", 53.375, -6.25),
    e("Edinburgh", 55.875, -3.125), e("Glasgow", 55.875, -4.25),
    e("Manchester", 53.5, -2.25), e("Liverpool", 53.375, -3.0),
    e("Leeds", 53.75, -1.5), e("Bristol", 51.5, -2.625),
    e("Cardiff", 51.5, -3.125), e("Belfast", 54.625, -5.875),
    e("Brussels", 50.875, 4.375), e("Antwerp", 51.25, 4.375),
    e("Ghent", 51.0, 3.75), e("Rotterdam", 51.875, 4.5),
    e("Utrecht", 52.125, 5.125), e("Eindhoven", 51.375, 5.5),
    e("Groningen", 53.25, 6.5), e("Luxembourg", 49.625, 6.125),
    e("Hamburg", 53.5, 10.0), e("Munich", 48.125, 11.625),
    e("Cologne", 50.875, 7.0), e("Frankfurt", 50.125, 8.625),
    e("Stuttgart", 48.75, 9.125), e("Dortmund", 51.5, 7.5),
    e("Essen", 51.5, 7.0), e("Leipzig", 51.375, 12.375),
    e("Dresden", 51.0, 13.75), e("Hanover", 52.375, 9.75),
    e("Nuremberg", 49.5, 11.125), e("Bremen", 53.125, 8.75),
    e("Zurich", 47.375, 8.5), e("Geneva", 46.25, 6.125),
    e("Basel", 47.5, 7.625), e("Bern", 46.875, 7.5),
    e("Lyon", 45.75, 4.875), e("Marseille", 43.25, 5.375),
    e("Toulouse", 43.625, 1.375), e("Bordeaux", 44.875, -0.625),
    e("Lille", 50.625, 3.0), e("Nantes", 47.25, -1.5),
    e("Strasbourg", 48.625, 7.75), e("Montpellier", 43.625, 3.875),
    e("Milan", 45.5, 9.125), e("Naples", 40.875, 14.25),
    e("Turin", 45.0, 7.625), e("Florence", 43.75, 11.25),
    e("Venice", 45.375, 12.375), e("Bologna", 44.5, 11.375),
    e("Genoa", 44.375, 8.875), e("Palermo", 38.125, 13.375),
    e("Seville", 37.375, -6.0), e("Zaragoza", 41.625, -0.875),
    e("Malaga", 36.75, -4.375), e("Bilbao", 43.25, -2.875),
    e("Granada", 37.125, -3.625), e("Porto", 41.125, -8.625),
    e("Prague", 50.125, 14.375), e("Brno", 49.25, 16.625),
    e("Warsaw", 52.25, 21.0), e("Krakow", 50.0, 19.875),
    e("Wroclaw", 51.125, 17.0), e("Gdansk", 54.375, 18.625),
    e("Poznan", 52.375, 16.875), e("Budapest", 47.5, 19.0),
    e("Bratislava", 48.125, 17.125), e("Ljubljana", 46.0, 14.5),
    e("Zagreb", 45.75, 16.0), e("Belgrade", 44.75, 20.5),
    e("Sarajevo", 43.875, 18.375), e("Skopje", 42.0, 21.375),
    e("Tirana", 41.375, 19.875), e("Athens", 38.0, 23.75),
    e("Thessaloniki", 40.625, 23.0), e("Sofia", 42.625, 23.375),
    e("Bucharest", 44.375, 26.125), e("Chisinau", 47.0, 28.875),
    e("Kyiv", 50.5, 30.5), e("Lviv", 49.875, 24.0),
    e("Odesa", 46.5, 30.75), e("Kharkiv", 50.0, 36.25),
    e("Minsk", 53.875, 27.5), e("Vilnius", 54.625, 25.25),
    e("Riga", 57.0, 24.125), e("Tallinn", 59.5, 24.75),
    e("Moscow", 55.75, 37.625), e("Kazan", 55.75, 49.125),
    e("Novosibirsk", 55.0, 82.875), e("Yekaterinburg", 56.875, 60.625),
    e("Istanbul", 41.0, 29.0), e("Ankara", 39.875, 32.875),
    e("Izmir", 38.375, 27.125), e("Nicosia", 35.125, 33.375),
    e("Valletta", 35.875, 14.5), e("Monaco", 43.75, 7.375),
    e("Andorra", 42.5, 1.5), e("Tbilisi", 41.75, 44.75),
    e("Yerevan", 40.125, 44.5), e("Baku", 40.375, 49.875),
    // Africa
    e("Cairo", 30.0, 31.25), e("Giza", 30.0, 31.125),
    e("Casablanca", 33.625, -7.625), e("Rabat", 34.0, -6.875),
    e("Marrakesh", 31.625, -8.0), e("Algiers", 36.75, 3.0),
    e("Tunis", 36.875, 10.125), e("Benghazi", 32.125, 20.125),
    e("Khartoum", 15.5, 32.5), e("Addis Ababa", 9.0, 38.75),
    e("Nairobi", -1.25, 36.875), e("Mombasa", -4.0, 39.625),
    e("Kampala", 0.375, 32.625), e("Kigali", -2.0, 30.125),
    e("Dodoma", -6.125, 35.75), e("Lusaka", -15.375, 28.25),
    e("Harare", -17.875, 31.0), e("Gaborone", -24.625, 25.875),
    e("Windhoek", -22.625, 17.125), e("Maputo", -25.875, 32.625),
    e("Johannesburg", -26.25, 28.0), e("Pretoria", -25.75, 28.25),
    e("Durban", -29.875, 31.0), e("Cape Town", -33.875, 18.375),
    e("Luanda", -8.875, 13.25), e("Kinshasa", -4.375, 15.25),
    e("Brazzaville", -4.25, 15.25), e("Libreville", 0.375, 9.375),
    e("Yaounde", 3.875, 11.5), e("Douala", 4.0, 9.75),
    e("Lagos", 6.5, 3.375), e("Abuja", 9.0, 7.5),
    e("Accra", 5.5, -0.25), e("Kumasi", 6.75, -1.625),
    e("Abidjan", 5.375, -4.0), e("Bamako", 12.625, -8.0),
    e("Dakar", 14.75, -17.375), e("Conakry", 9.5, -13.75),
    e("Freetown", 8.5, -13.25), e("Monrovia", 6.375, -10.75),
    e("Ouagadougou", 12.375, -1.5), e("Niamey", 13.5, 2.125),
    e("Antananarivo", -18.875, 47.5), e("Port Louis", -20.125, 57.5),
    // Middle East & Central Asia
    e("Jerusalem", 31.75, 35.25), e("Tel Aviv", 32.125, 34.75),
    e("Amman", 31.875, 35.875), e("Beirut", 33.875, 35.5),
    e("Damascus", 33.5, 36.25), e("Baghdad", 33.375, 44.375),
    e("Riyadh", 24.625, 46.75), e("Jeddah", 21.5, 39.125),
    e("Mecca", 21.375, 39.875), e("Doha", 25.25, 51.5),
    e("Dubai", 25.25, 55.25), e("Abu Dhabi", 24.5, 54.375),
    e("Muscat", 23.625, 58.5), e("Kuwait City", 29.375, 48.0),
    e("Manama", 26.25, 50.625), e("Sanaa", 15.375, 44.25),
    e("Tehran", 35.625, 51.375), e("Isfahan", 32.625, 51.625),
    e("Kabul", 34.5, 69.125), e("Tashkent", 41.25, 69.25),
    e("Samarkand", 39.625, 66.875), e("Almaty", 43.25, 76.875),
    e("Astana", 51.125, 71.375), e("Bishkek", 42.875, 74.625),
    e("Dushanbe", 38.5, 68.75), e("Ashgabat", 37.875, 58.375),
    // South & East Asia
    e("New Delhi", 28.625, 77.25), e("Mumbai", 19.0, 72.875),
    e("Kolkata", 22.5, 88.375), e("Chennai", 13.0, 80.25),
    e("Bengaluru", 13.0, 77.625), e("Pune", 18.5, 73.875),
    e("Ahmedabad", 23.0, 72.625), e("Jaipur", 26.875, 75.75),
    e("Lucknow", 26.875, 81.0), e("Kanpur", 26.5, 80.375),
    e("Nagpur", 21.125, 79.125), e("Surat", 21.125, 72.875),
    e("Karachi", 24.875, 67.0), e("Lahore", 31.5, 74.375),
    e("Islamabad", 33.625, 73.125), e("Dhaka", 23.75, 90.375),
    e("Chittagong", 22.375, 91.75), e("Colombo", 6.875, 79.875),
    e("Kathmandu", 27.75, 85.375), e("Thimphu", 27.5, 89.625),
    e("Yangon", 16.875, 96.125), e("Bangkok", 13.75, 100.5),
    e("Hanoi", 21.0, 105.875), e("Da Nang", 16.0, 108.25),
    e("Phnom Penh", 11.5, 104.875), e("Vientiane", 17.875, 102.625),
    e("Kuala Lumpur", 3.125, 101.625), e("Singapore", 1.375, 103.875),
    e("Jakarta", -6.125, 106.875), e("Surabaya", -7.25, 112.75),
    e("Bandung", -6.875, 107.625), e("Medan", 3.625, 98.625),
    e("Manila", 14.625, 121.0), e("Cebu", 10.25, 123.875),
    e("Beijing", 39.875, 116.375), e("Shanghai", 31.25, 121.5),
    e("Guangzhou", 23.125, 113.25), e("Shenzhen", 22.5, 114.125),
    e("Chengdu", 30.625, 104.125), e("Chongqing", 29.5, 106.5),
    e("Wuhan", 30.625, 114.25), e("Xian", 34.25, 108.875),
    e("Tianjin", 39.125, 117.25), e("Nanjing", 32.125, 118.75),
    e("Hangzhou", 30.25, 120.125), e("Harbin", 45.75, 126.625),
    e("Hong Kong", 22.25, 114.125), e("Macau", 22.125, 113.5),
    e("Taipei", 25.0, 121.5), e("Kaohsiung", 22.625, 120.25),
    e("Seoul", 37.5, 127.0), e("Busan", 35.125, 129.0),
    e("Incheon", 37.5, 126.625), e("Pyongyang", 39.0, 125.75),
    e("Tokyo", 35.625, 139.75), e("Osaka", 34.625, 135.5),
    e("Nagoya", 35.125, 136.875), e("Sapporo", 43.0, 141.375),
    e("Fukuoka", 33.625, 130.375), e("Kyoto", 35.0, 135.75),
    e("Yokohama", 35.375, 139.625), e("Ulaanbaatar", 47.875, 106.875),
    // Oceania
    e("Sydney", -33.875, 151.25), e("Melbourne", -37.875, 145.0),
    e("Brisbane", -27.5, 153.0), e("Perth", -31.875, 115.875),
    e("Adelaide", -34.875, 138.625), e("Canberra", -35.25, 149.125),
    e("Hobart", -42.875, 147.375), e("Darwin", -12.375, 130.875),
    e("Auckland", -36.875, 174.75), e("Wellington", -41.25, 174.75),
    e("Christchurch", -43.5, 172.625), e("Suva", -18.125, 178.375),
    // North America
    e("Anchorage", 61.125, -149.875), e("Vancouver", 49.25, -123.125),
    e("Calgary", 51.0, -114.0), e("Edmonton", 53.5, -113.5),
    e("Winnipeg", 49.875, -97.125), e("Toronto", 43.625, -79.375),
    e("Ottawa", 45.375, -75.625), e("Montreal", 45.5, -73.625),
    e("Quebec City", 46.875, -71.25), e("Halifax", 44.625, -63.625),
    e("Seattle", 47.625, -122.375), e("Portland", 45.5, -122.625),
    e("San Francisco", 37.75, -122.375), e("Oakland", 37.75, -122.25),
    e("San Jose", 37.375, -121.875), e("Sacramento", 38.625, -121.5),
    e("Los Angeles", 34.0, -118.25), e("San Diego", 32.75, -117.125),
    e("Las Vegas", 36.125, -115.125), e("Phoenix", 33.5, -112.0),
    e("Tucson", 32.25, -110.875), e("Albuquerque", 35.125, -106.625),
    e("Denver", 39.75, -105.0), e("Salt Lake City", 40.75, -111.875),
    e("Boise", 43.625, -116.25), e("Billings", 45.75, -108.5),
    e("Fargo", 46.875, -96.75), e("Minneapolis", 45.0, -93.25),
    e("Milwaukee", 43.0, -87.875), e("Chicago", 41.875, -87.625),
    e("Detroit", 42.375, -83.0), e("Indianapolis", 39.75, -86.125),
    e("Columbus", 40.0, -83.0), e("Cleveland", 41.5, -81.625),
    e("Cincinnati", 39.125, -84.5), e("Pittsburgh", 40.375, -80.0),
    e("Buffalo", 42.875, -78.875), e("Boston", 42.375, -71.0),
    e("Providence", 41.875, -71.375), e("Hartford", 41.75, -72.625),
    e("New York", 40.75, -74.0), e("Newark", 40.75, -74.125),
    e("Philadelphia", 39.875, -75.125), e("Baltimore", 39.25, -76.625),
    e("Washington", 38.875, -77.0), e("Norfolk", 36.875, -76.25),
    e("Raleigh", 35.75, -78.625), e("Charlotte", 35.25, -80.875),
    e("Atlanta", 33.75, -84.375), e("Nashville", 36.125, -86.75),
    e("Memphis", 35.125, -90.0), e("St Louis", 38.625, -90.25),
    e("Kansas City", 39.125, -94.625), e("Omaha", 41.25, -96.0),
    e("Oklahoma City", 35.5, -97.5), e("Tulsa", 36.125, -96.0),
    e("Dallas", 32.75, -96.75), e("Austin", 30.25, -97.75),
    e("Houston", 29.75, -95.375), e("San Antonio", 29.375, -98.5),
    e("El Paso", 31.75, -106.5), e("New Orleans", 30.0, -90.125),
    e("Jacksonville", 30.375, -81.625), e("Orlando", 28.5, -81.375),
    e("Tampa", 27.875, -82.5), e("Miami", 25.75, -80.25),
    e("Honolulu", 21.25, -157.875),
    // Latin America
    e("Mexico City", 19.375, -99.125), e("Guadalajara", 20.625, -103.375),
    e("Monterrey", 25.625, -100.25), e("Tijuana", 32.5, -117.0),
    e("Cancun", 21.125, -86.875), e("Havana", 23.125, -82.375),
    e("Kingston", 18.0, -76.75), e("Port au Prince", 18.5, -72.375),
    e("Santo Domingo", 18.5, -69.875), e("San Juan", 18.375, -66.125),
    e("Guatemala City", 14.625, -90.5), e("San Salvador", 13.625, -89.25),
    e("Tegucigalpa", 14.125, -87.25), e("Managua", 12.125, -86.25),
    e("Panama City", 9.0, -79.5), e("Bogota", 4.625, -74.125),
    e("Medellin", 6.25, -75.5), e("Cali", 3.375, -76.5),
    e("Caracas", 10.5, -66.875), e("Quito", -0.125, -78.5),
    e("Guayaquil", -2.125, -79.875), e("Lima", -12.0, -77.0),
    e("Cusco", -13.5, -72.0), e("La Paz", -16.5, -68.125),
    e("Asuncion", -25.25, -57.625), e("Montevideo", -34.875, -56.125),
    e("Buenos Aires", -34.625, -58.375), e("Rosario", -33.0, -60.625),
    e("Mendoza", -32.875, -68.875), e("Sao Paulo", -23.5, -46.625),
    e("Rio de Janeiro", -22.875, -43.25), e("Brasilia", -15.75, -47.875),
    e("Fortaleza", -3.75, -38.5), e("Belo Horizonte", -19.875, -43.875),
    e("Recife", -8.0, -34.875), e("Manaus", -3.125, -60.0),
    e("Curitiba", -25.375, -49.25),
    // NB: "Salvador" and "Porto Alegre" are deliberately absent — they would
    // be word-boundary substrings of / supersets of "San Salvador" / "Porto",
    // which the one-mention-one-span scan forbids (GazetteerSpec invariant)
  )

  val entries: Seq[Entry] = original ++ ambiguous ++ regions ++ cities

  /** name → ranked hits (the TextGeo.gazetteer shape). */
  val byName: Map[String, Seq[(Double, Double)]] =
    entries.map(en => en.name -> en.hits).toMap

  /** First token of each name → all full-name surfaces sharing it (longest
    * first), for the token-indexed one-pass text scan.
    */
  val byFirstToken: Map[String, Seq[String]] =
    entries.map(_.name).groupBy(_.takeWhile(_.isLetter))
      .map { case (tok, names) => tok -> names.sortBy(n => (-n.length, n)) }

  require(entries.map(_.name).distinct.length == entries.length, "duplicate gazetteer name")
}
